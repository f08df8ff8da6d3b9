package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Differential specs for the round-8 rewrites: the optimized distributed
  * plans must agree EXACTLY with naive in-memory reference implementations
  * on randomized corpora (seeded — failures reproduce). These guard the
  * algebraic claims the rewrites rest on:
  *  - q22 bucket pair emission == the df-capped shared-shingle join it
  *    replaced (each unordered pair counted once per shared in-cap
  *    shingle; sizes from distinct-shingle counts);
  *  - q21 chunk-pigeonhole candidate generation has EXACT recall at
  *    Hamming ≤ 3 (any such pair shares one of 4 chunks).
  */
class TextDedupDifferentialSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Seeded corpus: small vocab (forces shared shingles and df-cap hits),
    * planted near-dup pairs (forces jaccard ≥ 0.5 rows). */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val base = (0 until n).map { i =>
      val len = 5 + rnd.nextInt(25)
      i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // plant near-dups: copies with one word appended
    val dups = (0 until n / 5).map { i =>
      (1000L + i) -> (base(rnd.nextInt(n))._2 + " " + vocab(rnd.nextInt(vocab.size)))
    }
    base ++ dups
  }

  private def shingleSet(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("ngramJaccardPairs == naive df-capped jaccard on random corpora") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val docs = corpus(seed, 60)
      val cap = 20
      val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      val df = sh.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
      val ids = docs.map(_._1)
      val expected = (for {
        a <- ids; b <- ids if a < b
        inter = (sh(a) intersect sh(b)).count(s => df(s) >= 2 && df(s) <= cap)
        if inter > 0
        j = math.rint(inter.toDouble / (sh(a).size + sh(b).size - inter) * 10000) / 10000
        if j >= 0.5
      } yield (a, b, j)).toSet

      val got = TextDedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          maxShingleDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"seed=$seed")
      assert(expected.nonEmpty, s"seed=$seed planted no pairs — weak test")
    }
  }

  test("winnowFingerprints == naive MOSS winnowing (positional shingles, window mins)") {
    def md5hex(s: String): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    def naive(text: String, w: Int): Set[String] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val sh = if (toks.size < 3) Seq.empty[String]
               else toks.sliding(3).map(_.mkString(" ")).toSeq
      val hs = sh.map(s => md5hex(s).substring(0, 8))
      if (hs.size >= w) hs.sliding(w).map(_.min).toSet
      else hs.minOption.toSet
    }
    for (seed <- Seq(5L, 13L)) {
      val docs = corpus(seed, 40)
      val expected = docs.flatMap { case (id, t) =>
        naive(t, 4).map(f => id -> f) }.toSet
      val got = TextDedup.winnowFingerprints(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(got === expected, s"seed=$seed")
      assert(expected.nonEmpty)
    }
  }

  test("simhashPairs == naive pairwise Hamming at distance <= 3 (exact recall)") {
    for (seed <- Seq(3L, 11L)) {
      val docs = corpus(seed, 50)
      val frame = docs.toDF("doc_id", "text")
      // signatures from the (independently oracle-verified) signature op;
      // the property under test is the PAIRING: pigeonhole candidates +
      // distinct must equal the full quadratic sweep
      val sigs = TextDedup.simhashSignatures(frame)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ids = docs.map(_._1)
      val expected = (for {
        a <- ids; b <- ids if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
        if h <= 3
      } yield (a, b, h)).toSet

      val got = TextDedup.simhashPairs(frame)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === expected, s"seed=$seed")
      assert(expected.nonEmpty, s"seed=$seed planted no pairs — weak test")
    }
  }
}
