package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs = (1L to 2000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")

  test("hashSample: deterministic, shuffle-free, near the target fraction") {
    val a = Sampling.hashSample(docs, col("id"), 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, col("id"), 0.3).collect().map(_.getLong(0)).toSet
    assert(a === b)                         // reproducible
    assert(math.abs(a.size - 600) < 120)    // Bernoulli, ±20% at n=2000
    val plan = Sampling.hashSample(docs, col("id"), 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))      // pure filter
  }

  test("hashSample: nested samples — smaller fraction is a subset") {
    val big = Sampling.hashSample(docs, col("id"), 0.5).collect().map(_.getLong(0)).toSet
    val small = Sampling.hashSample(docs, col("id"), 0.2).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big)) // same hash, lower threshold
  }

  test("weightedMix: per-stratum fractions with default") {
    val out = Sampling.weightedMix(docs, col("src"), col("id"),
      Map("s0" -> 1.0, "s1" -> 0.0), default = 0.5)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("s0") === 500)             // fraction 1.0 keeps all
    assert(!bySrc.contains("s1"))           // fraction 0.0 keeps none
    assert(bySrc("s2") > 150 && bySrc("s2") < 350) // default 0.5 of 500
  }

  test("stratifiedQuota: exact per-stratum sizes, deterministic choice") {
    val out = Sampling.stratifiedQuota(docs, col("src"), col("id"), quota = 7)
    val counts = out.groupBy("src").count().collect().map(_.getLong(1))
    assert(counts.toSeq === Seq.fill(4)(7L))
    val again = Sampling.stratifiedQuota(docs, col("src"), col("id"), quota = 7)
    assert(out.collect().map(_.getLong(0)).toSet ===
           again.collect().map(_.getLong(0)).toSet)
  }

  test("stratifiedQuota: quota larger than stratum keeps whole stratum") {
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "src")
    val out = Sampling.stratifiedQuota(tiny, col("src"), col("id"), quota = 10)
    assert(out.count() === 3)
  }

  test("temperatureMix: min stratum intact, shares flatten toward n^alpha") {
    // skewed strata: 1600/300/100
    val skewed = (1L to 2000L).map { i =>
      (i, if (i <= 1600) "big" else if (i <= 1900) "mid" else "small")
    }.toDF("id", "src")
    val out = Sampling.temperatureMix(skewed, col("src"), col("id"), alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("small") === 100) // rate exactly 1.0: nothing dropped
    // expected kept: n_min^0.5 * n_i^0.5 → big 400, mid 173 (Bernoulli ±)
    assert(math.abs(bySrc("big") - 400) < 120)
    assert(math.abs(bySrc("mid") - 173) < 80)
    // deterministic: same rows on re-run
    val again = Sampling.temperatureMix(skewed, col("src"), col("id"), alpha = 0.5)
      .collect().map(r => r.getLong(0)).toSet
    assert(again === out.map(_._1).toSet)
    // alpha = 1 keeps the natural mix (rate 1.0 everywhere)
    assert(Sampling.temperatureMix(skewed, col("src"), col("id"), alpha = 1.0)
      .count() === 2000L)
  }

  test("temperatureMix: null stratum is its own group, not dropped") {
    val withNull = Seq((1L, Some("a")), (2L, Some("a")), (3L, Option.empty[String]))
      .toDF("id", "src")
    val out = Sampling.temperatureMix(withNull, col("src"), col("id"), alpha = 0.5)
    // null stratum is the min (n=1) → rate 1.0 → its row survives
    assert(out.filter(col("src").isNull).count() === 1L)
  }

  test("assignSplits: disjoint, exhaustive, deterministic, near target shares") {
    val bands = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplits(docs, col("id"), bands)
    // exhaustive: every row got exactly one split, nothing dropped or doubled
    assert(out.count() === 2000L)
    assert(out.filter(col("split").isNull).count() === 0L)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(math.abs(bySplit("train") - 1600) < 120) // Bernoulli ±
    assert(math.abs(bySplit("val") - 200) < 80)
    assert(math.abs(bySplit("test") - 200) < 80)
    // deterministic and partitioning-independent: the leakage guarantee —
    // re-runs and re-layouts can never move a doc across the test fence
    val a = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.assignSplits(docs.repartition(13), col("id"), bands)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b)
    // shuffle-free scan projection
    val plan = Sampling.assignSplits(docs, col("id"), bands)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // consistent with hashSample's bands: the train split IS the 0.8 sample
    val trainIds = out.filter(col("split") === "train")
      .collect().map(_.getLong(0)).toSet
    val sampled = Sampling.hashSample(docs, col("id"), 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(trainIds === sampled)
  }

  test("assignSplits: rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("scoreSample: acceptance == the row's own score, monotone and deterministic") {
    // 4 score bands over 2000 ids: 1.0 keeps all, 0.0 keeps none,
    // middle bands keep ≈ their score's share
    val scored = docs.withColumn("score",
      when(col("id") % 4 === 0, 1.0).when(col("id") % 4 === 1, 0.0)
        .when(col("id") % 4 === 2, 0.25).otherwise(0.75))
    val kept = Sampling.scoreSample(scored, col("score"), col("id"))
      .collect().map(r => r.getLong(0)).toSet
    val byBand = kept.groupBy(id => id % 4).view.mapValues(_.size).toMap
    assert(byBand(0) === 500)            // score 1.0: everything survives
    assert(!byBand.contains(1L))         // score 0.0: nothing
    assert(math.abs(byBand(2L) - 125) < 60)  // 0.25 of 500, Bernoulli ±
    assert(math.abs(byBand(3L) - 375) < 60)  // 0.75 of 500
    // monotone in score: a row kept at score s is kept at every s' >= s
    // (same hash, higher threshold) — raising quality never drops a doc
    val keptLower = Sampling.scoreSample(
      scored.withColumn("score", col("score") * 0.5), col("score"), col("id"))
      .collect().map(r => r.getLong(0)).toSet
    assert(keptLower.subsetOf(kept))
    // deterministic re-run
    val again = Sampling.scoreSample(scored, col("score"), col("id"))
      .collect().map(r => r.getLong(0)).toSet
    assert(again === kept)
    // out-of-range scores clamp instead of misbehaving
    val wild = Sampling.scoreSample(
      scored.withColumn("score", col("score") * 3.0 - 1.0), col("score"), col("id"))
    assert(wild.filter(col("id") % 4 === 1).count() === 0) // clamp at 0
  }
}
