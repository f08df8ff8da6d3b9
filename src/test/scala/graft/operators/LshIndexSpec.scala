package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Lifecycle spec for the persisted MinHash-LSH text index: build → probe →
  * append → re-probe. The declared q102 exercises build+probe under the
  * DuckDB oracle; the INCREMENTAL side (append cost model, idempotent
  * re-probe, growth visibility) only lives here. */
class LshIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")

  private def randomDoc(id: Long, seed: Long) = {
    val rnd = new scala.util.Random(seed * 7919 + id)
    doc(id, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))))
  }

  test("probe finds a planted near-dup of an indexed doc; unique docs stay silent") {
    val dir = tempDir("lsh-index")
    val corpusDocs = (1L to 40L).map(randomDoc(_, seed = 1))
    TextDedup.buildLshIndex(corpusDocs.toDF("doc_id", "text"), dir)

    // incoming: one near-dup of corpus doc 7 (one word appended), one
    // genuinely fresh doc
    val nearDup = (100L, corpusDocs.find(_._1 == 7L).get._2 + " omega")
    val fresh = randomDoc(999L, seed = 42)
    val got = TextDedup.probeLshIndex(
        Seq(nearDup, fresh).toDF("doc_id", "text"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(got.contains(100L), "planted near-dup not detected")
    assert(got(100L) == 7L)
    assert(!got.contains(999L), "fresh doc falsely flagged")
  }

  test("append then re-probe: appended batch is found by later batches, " +
    "and re-probing an appended batch is idempotent (no self-dups)") {
    val dir = tempDir("lsh-index")
    val corpusDocs = (1L to 30L).map(randomDoc(_, seed = 2))
    TextDedup.buildLshIndex(corpusDocs.toDF("doc_id", "text"), dir)

    // batch 1: a fresh doc; silent against the initial corpus
    val batch1 = Seq(randomDoc(200L, seed = 77))
    assert(TextDedup.probeLshIndex(batch1.toDF("doc_id", "text"), dir).count() === 0L)

    TextDedup.appendToLshIndex(batch1.toDF("doc_id", "text"), dir)

    // re-probing the SAME batch after appending it: self-collisions are
    // excluded, so the verdict stays empty instead of flipping to all-dups
    assert(TextDedup.probeLshIndex(batch1.toDF("doc_id", "text"), dir).count() === 0L)

    // batch 2 contains a near-dup of the APPENDED doc — only the grown
    // index can catch it
    val batch2 = Seq((300L, batch1.head._2 + " omega"))
    val got = TextDedup.probeLshIndex(batch2.toDF("doc_id", "text"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((300L, 200L)))
  }

  test("estimate matches the exact agreeing-minhash fraction") {
    val dir = tempDir("lsh-index")
    val d = randomDoc(5L, seed = 9)
    TextDedup.buildLshIndex(Seq(d).toDF("doc_id", "text"), dir)
    // identical text under a different id → all k minhashes agree → 1.0
    val got = TextDedup.probeLshIndex(Seq((6L, d._2)).toDF("doc_id", "text"), dir)
      .collect()
    assert(got.length === 1)
    assert(got.head.getDouble(2) === 1.0)
  }
}
