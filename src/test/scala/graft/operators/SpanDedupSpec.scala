package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Span-level dedup specs: a hand case with known spans, a differential
  * check against a naive in-memory reference on seeded random corpora with
  * planted duplicated regions, and reconstruct invariants (token
  * accounting; canonical copy survives). */
class SpanDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = 4 // small gram width so tests stay readable

  private def tok(t: String): Vector[String] =
    t.trim.toLowerCase.split("\\s+").toVector

  /** Naive reference: quadratic-ish in-memory replay of the declared
    * semantics — gram occurrences grouped by gram TEXT (md5 is injective
    * for the test corpus), cross-doc buckets under the df cap, optional
    * canonical (min (doc,pos)) withheld, hits merged into maximal spans. */
  private def naiveSpans(docs: Seq[(Long, String)], k: Int, cap: Int,
                         dropCanonical: Boolean): Map[Long, Vector[(Int, Int)]] = {
    val occ = for {
      (id, text) <- docs
      toks = tok(text)
      if toks.size >= k
      i <- 1 to toks.size - k + 1
    } yield (toks.slice(i - 1, i - 1 + k).mkString(" "), id, i)
    val hits = occ.groupBy(_._1).values.flatMap { bucket =>
      val docsIn = bucket.map(_._2)
      if (docsIn.min == docsIn.max || bucket.size > cap) Nil
      else if (dropCanonical) bucket.sortBy(o => (o._2, o._3)).tail
      else bucket
    }.map(o => (o._2, o._3)).toSeq
    hits.groupBy(_._1).map { case (doc, ps) =>
      val sorted = ps.map(_._2).distinct.sorted
      val spans = sorted.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc :+ ((lo, hi)), p) if p - (hi - k + 1) <= k => acc :+ ((lo, p + k - 1))
        case (acc, p) => acc :+ ((p, p + k - 1))
      }
      doc -> spans
    }
  }

  /** Seeded corpus with PLANTED duplicated regions: random word-soup docs,
    * then a shared block of 6-12 tokens spliced into several docs. */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon")
    def words(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
    val base = (0 until n).map(i => i.toLong -> words(10 + rnd.nextInt(30)).toVector)
    val blocks = Seq.fill(3)(words(6 + rnd.nextInt(7)).toVector)
    val planted = base.map { case (id, toks) =>
      if (rnd.nextDouble() < 0.4) {
        val b = blocks(rnd.nextInt(blocks.size))
        val at = rnd.nextInt(toks.size + 1)
        id -> (toks.take(at) ++ b ++ toks.drop(at))
      } else id -> toks
    }
    planted.map { case (id, toks) => id -> toks.mkString(" ") }
  }

  test("duplicateSpans: hand case with a known shared span") {
    // docs 1 and 2 share the 6-token run "a b c d e f" (grams at pos 2..4
    // in doc 1 merge into ONE span of 8 tokens: lo=2, hi=4+K-1=7? — doc 1
    // tokens: x a b c d e f y -> hits at pos 2,3 (grams "a b c d","b c d e",
    // wait K=4: shared grams of the 6-token run are at offsets 0,1,2).
    val docs = Seq(
      (1L, "x a b c d e f y"),   // run at tokens 2..7 -> hits pos 2,3,4 -> span [2,7] = 6 tokens
      (2L, "a b c d e f q r s"), // run at tokens 1..6 -> span [1,6] = 6 tokens
      (3L, "p q r s t u v w")    // no cross-doc grams
    ).toDF("doc_id", "text")
    val got = SpanDedup.duplicateSpans(docs, k = K, maxGramDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 6L), (2L, 1L, 6L)))
  }

  test("dedupReconstruct: canonical copy survives, later copy is cut") {
    val docs = Seq(
      (1L, "x a b c d e f y"),
      (2L, "a b c d e f q r s"),
      (3L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val got = SpanDedup.dedupReconstruct(docs, k = K, maxGramDf = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, "x a b c d e f y", 0L),  // doc 1 holds the canonical occurrences
      (2L, "q r s", 6L),            // duplicated run removed
      (3L, "p q r s t u v w", 0L)))
  }

  test("duplicateSpans == naive reference on random planted corpora") {
    for (seed <- Seq(3L, 11L, 77L)) {
      val docs = corpus(seed, 40)
      val expected = naiveSpans(docs, K, cap = 1000, dropCanonical = false)
        .collect { case (doc, spans) if spans.nonEmpty =>
          (doc, spans.size.toLong, spans.map { case (lo, hi) => hi - lo + 1 }.sum.toLong)
        }.toSet
      val got = SpanDedup.duplicateSpans(docs.toDF("doc_id", "text"), k = K, maxGramDf = 1000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"seed=$seed")
      assert(got.nonEmpty, s"seed=$seed planted blocks produced no spans")
    }
  }

  test("dedupReconstruct == naive reference and accounts for every token") {
    for (seed <- Seq(3L, 11L)) {
      val docs = corpus(seed, 40)
      val removal = naiveSpans(docs, K, cap = 1000, dropCanonical = true)
      val expected = docs.map { case (id, text) =>
        val toks = tok(text)
        val cut = removal.getOrElse(id, Vector.empty)
        val keep = toks.zipWithIndex.collect {
          case (t, i) if !cut.exists { case (lo, hi) => i + 1 >= lo && i + 1 <= hi } => t
        }
        (id, keep.mkString(" "), cut.map { case (lo, hi) => (hi - lo + 1).toLong }.sum)
      }.toSet
      val got = SpanDedup.dedupReconstruct(docs.toDF("doc_id", "text"), k = K, maxGramDf = 1000)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected, s"seed=$seed")
      // token accounting: original = surviving + removed, for every doc
      got.foreach { case (id, clean, removed) =>
        val orig = tok(docs.find(_._1 == id).get._2).size.toLong
        val kept = if (clean.isEmpty) 0L else clean.split(" ").length.toLong
        assert(orig === kept + removed, s"seed=$seed doc=$id")
      }
    }
  }

  test("maxGramDf drops boilerplate buckets") {
    // the gram "a b c d" appears in 5 docs; cap 4 suppresses it entirely
    val docs = (1L to 5L).map(i => (i, s"w$i a b c d z$i")).toDF("doc_id", "text")
    assert(SpanDedup.duplicateSpans(docs, k = K, maxGramDf = 4).count() === 0L)
    assert(SpanDedup.duplicateSpans(docs, k = K, maxGramDf = 5).count() === 5L)
  }

  test("GramMd5Prefix16 kernel == declarative substring(md5(concat_ws)) chain") {
    import org.apache.spark.sql.functions._
    graft.plans.GramMd5Prefix16.register(spark)
    val rnd = new scala.util.Random(119)
    val texts = (1 to 50).map(_ => (1 to rnd.nextInt(20))
      .map(_ => s"tok${rnd.nextInt(9)}").mkString(" ")) ++
      Seq("", "one", "héllo wörld ünïcode gram test", "a b c")
    for (k <- Seq(2, 3, 8)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("t"))
        .select(col("doc_id"),
          call_function("graft_gram_md5_16", col("t"), lit(k)).as("kern"),
          when(size(col("t")) >= k,
            transform(sequence(lit(1), size(col("t")) - (k - 1)),
              i => substring(md5(concat_ws(" ", slice(col("t"), i, lit(k)))), 1, 16)))
            .otherwise(array().cast("array<string>")).as("decl"))
      assert(df.filter(not(col("kern") === col("decl"))).count() === 0L,
        s"kernel/declarative mismatch at k=$k")
    }
  }
}
