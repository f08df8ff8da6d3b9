package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs at sf0.001 and produces rows, and every
  * query has an oracle (or is knowingly oracle-less). Hash-level checking
  * against DuckDB happens in the driver's gate + tools/check_correctness.py. */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Candidate-pair queries may legitimately be empty at tiny scale (LSH
    * recall is probabilistic); they must still run. */
  private val mayBeEmpty = Set(
    "q20_minhash_lsh_pairs", "q21_simhash_pairs",
    "q22_ngram_jaccard_pairs", "q24_embedding_near_dup",
    "q44_containment_pairs", "q47_edit_distance_pairs", "q48_range_join")

  Queries.all.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sfDir).count()
      if (!mayBeEmpty(name)) assert(n > 0)
      else info(s"$name rows: $n")
    }
  }

  /** Queries with deliberately no SQL oracle (driver does a rows-only
    * check); each must have a behavior spec instead. (r17 shrank this
    * set: q42/q107/q109/q118 gained full oracles — portable sketches and
    * the exact-Lloyd form.) */
  private val oracleless =
    Set("q25_ann_topk", "q36_ivf_topk",
      "q80_compressibility", "q89_quality_classifier", "q98_pq_topk",
      "q110_bpe_train", "q121_bpe_encode", "q129_bpe_encode_vocab")

  test("q42 approx distinct is within 5% of exact") {
    val row = Queries.all("q42_approx_distinct")(spark, sfDir).head()
    val exact = Tables.load(spark, sfDir, "lineitem")
      .selectExpr("count(distinct l_orderkey)", "count(distinct l_partkey)").head()
    assert(math.abs(row.getDouble(0) - exact.getLong(0)) / exact.getLong(0) < 0.05)
    assert(math.abs(row.getDouble(1) - exact.getLong(1)) / exact.getLong(1) < 0.05)
  }

  test("q109 approx percentiles: gate runs, one row per status, sane order") {
    // the declared query self-gates on rank error ≤ 1%; reaching the
    // assertions below means the gate passed on real data
    val rows = Queries.all("q109_approx_percentiles")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length === 3) // order statuses O/F/P
    rows.foreach { case (st, p50, p90) =>
      assert(p50 <= p90, s"$st: p50 $p50 > p90 $p90")
    }
    val exact = Queries.all("q38_percentiles")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (st, p50, p90) =>
      // sketch values sit near the exact interpolated percentiles on this
      // smooth distribution (rank guarantee ⇒ loose value tolerance)
      assert(math.abs(p50 - exact(st)._1) / exact(st)._1 < 0.05)
      assert(math.abs(p90 - exact(st)._2) / exact(st)._2 < 0.05)
    }
  }

  test("q131 leakage invariant: no LSH cluster straddles two splits") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val out = Queries.all("q131_leakage_safe_split")(spark, sfDir)
    val straddling = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(straddling === 0)
    // every document is assigned exactly once
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(out.count() === docs)
  }

  test("every query has an oracle (or is a declared rows-only op)") {
    val missing = Queries.all.keySet -- Queries.oracles.keySet -- oracleless
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every oracle points at a declared query") {
    val dangling = Queries.oracles.keySet -- Queries.all.keySet
    assert(dangling.isEmpty, s"oracles without query: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
