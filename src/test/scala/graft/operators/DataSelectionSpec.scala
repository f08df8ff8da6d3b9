package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DataSelection.dsirWeights]] + [[TextAnalysis.distinctNgramStats]] —
  * the round-14 training-mix trio's operator-level behavior (q132/q133
  * carry the cross-engine oracles; these specs pin the semantics the
  * oracles assume). */
class DataSelectionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta alpha", "en"),
    (2L, "alpha beta gamma", "en"),
    (3L, "delta delta delta", "zh"),
    (4L, "beta gamma delta epsilon", "zh"),
    (5L, "   ", "en") // whitespace-only: no tokens, no output row
  ).toDF("doc_id", "text", "lang")

  test("dsirWeights: target-like docs score above off-target docs") {
    val out = DataSelection.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 3 is pure 'delta' — a token the target (en) slice never uses;
    // docs 1/2 use only target vocabulary. Importance must rank them
    // above 3, and 3's raw-only vocabulary scores strictly negative.
    // (Signs of 1/2 are NOT asserted: add-one smoothing at these tiny
    // counts legitimately drags shared-vocabulary weights slightly
    // negative — the hand-computed test below pins exact values.)
    assert(out(1L) > out(3L) && out(2L) > out(3L))
    assert(out(3L) < 0.0)
  }

  test("dsirWeights: empty docs emit no row; n_tokens is the token count") {
    val out = DataSelection.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(5L))
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L))
  }

  test("dsirWeights: hand-computed weight on a 1-bucket-per-token corpus") {
    // With buckets large enough that these five tokens land in distinct
    // buckets (verified below), the model is exact unigram add-one.
    val b = 4096
    val out = DataSelection.dsirWeights(docs, col("lang") === "en", buckets = b)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val toks = Map( // token -> (target count, raw count)
      "alpha" -> (3L, 3L), "beta" -> (2L, 3L), "gamma" -> (1L, 2L),
      "delta" -> (0L, 4L), "epsilon" -> (0L, 1L))
    val hashes = toks.keys.map(t =>
      java.lang.Long.parseLong(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(t).substring(0, 15), 16) % b).toSet
    assume(hashes.size === toks.size) // distinct buckets, else skip
    val tTot = 6.0 + b; val rTot = 13.0 + b
    def w(ws: Seq[String]) = BigDecimal(ws.map { t =>
      val (ct, cs) = toks(t)
      math.log((ct + 1) / tTot) - math.log((cs + 1) / rTot)
    }.sum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === w(Seq("alpha", "beta", "alpha")))
    assert(out(3L) === w(Seq("delta", "delta", "delta")))
  }

  test("dsirWeights: scoring is a join-free, shuffle-free projection over " +
    "the cached compact frame (round-15 fused shape)") {
    val plan = DataSelection.dsirWeights(docs, col("lang") === "en")
      .queryExecution.executedPlan.toString
    // the cached relation prints its own build plan (which contains the
    // rebalance exchange) — only the scoring section above the cache
    // scan must be join- and shuffle-free
    assert(plan.contains("InMemoryTableScan"),
      s"compact (bucket, tf) frame must be cached — model build and scorer " +
        s"both consume it:\n$plan")
    val scoring = plan.substring(0, plan.indexOf("InMemoryTableScan"))
    assert(!scoring.contains("Join"), s"join crept into the scoring pass:\n$plan")
    assert(!scoring.contains("Exchange"), s"shuffle in the scoring pass:\n$plan")
  }

  test("distinctNgramStats: exact ratios on a hand-checked corpus") {
    val two = Seq(("a", "x y x y"), ("a", "x y"), ("b", "z")).toDF("source", "text")
    val out = TextAnalysis.distinctNgramStats(two)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // source a, n=1: tokens x y x y | x y → 6 total, 2 distinct
    assert(out(("a", 1)) === ((6L, 2L, 0.3333)))
    // n=2: "x y","y x","x y" + "x y" → 4 total, 2 distinct
    assert(out(("a", 2)) === ((4L, 2L, 0.5)))
    // n=3: "x y x","y x y" → 2 total, 2 distinct
    assert(out(("a", 3)) === ((2L, 2L, 1.0)))
    // source b: single token — n=1 only; no n=2/n=3 rows
    assert(out(("b", 1)) === ((1L, 1L, 1.0)))
    assert(!out.contains(("b", 2)) && !out.contains(("b", 3)))
  }

  test("distinctNgramStats: degenerate repeated source collapses distinct-2") {
    val rep = Seq.fill(20)(("tpl", "buy now buy now buy now")).toDF("source", "text")
    val out = TextAnalysis.distinctNgramStats(rep)
      .collect().map(r => r.getInt(1) -> r.getDouble(4)).toMap
    assert(out(2) === 0.02) // 100 bigrams (5 × 20 docs), 2 distinct
  }
}
