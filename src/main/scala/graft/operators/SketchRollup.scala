package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-aggregated distinct-count sketches — the production pattern for
  * COUNT(DISTINCT) over 100 TB: persist one compact HLL sketch per
  * (key, time-bucket) at ingest, then answer any later rollup by MERGING
  * sketches instead of rescanning raw data. Works because HLL union
  * operates on the register lattice: `union(sketch(A), sketch(B))`
  * carries the same max-registers as `sketch(A ∪ B)` (the union
  * gadget's estimator mode can move the ESTIMATE by a fraction of a
  * percent — spec-pinned at ≤1%), so a year-over-year distinct-users
  * query reads 365 sketch rows per key, not a year of events — and
  * buckets can be re-merged along ANY dimension after the fact (the
  * property partial sums have for SUM, extended to DISTINCT).
  *
  * Built on Spark's Datasketches-backed `hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` (codegen'd aggregates,
  * fixed-size buffers, map-side combine). The sketch column is plain
  * BINARY — it survives parquet round trips, which is the point:
  * [[buildSketches]]' output is a lake table.
  *
  * Declared as q107 rows-only (sketch internals are engine-specific; no
  * SQL oracle can reproduce the estimate) with a runtime self-gate
  * against the exact twin, the q42/q89 pattern; the merge-exactness
  * property is spec-pinned.
  */
object SketchRollup {

  /** One HLL sketch (+ row count) per (keys..., bucket): the ingest-time
    * aggregation whose output is persisted. One shuffle, map-side
    * partial sketches. */
  def buildSketches(df: DataFrame, keys: Seq[String], bucket: Column,
                    value: Column, lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col) :+ bucket.as("bucket"): _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Roll persisted sketches up to `keys`, estimating the distinct count
    * of the original value column across all merged buckets. Input is
    * sketch rows (tiny), never raw data. */
  def mergedEstimate(sketches: DataFrame, keys: Seq[String]): DataFrame =
    sketches.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .cast("long").as("approx_distinct"),
        sum("n_rows").as("n_rows"))

  /** ENGINE-PORTABLE HyperLogLog (round-17: the move that made the
    * distinct-count sketches oracle-checkable — q42/q107 from rows-only
    * to hash-green).
    *
    * Datasketches HLL internals are engine-specific, so its estimate can
    * only ever be self-gated. This variant derives every register from
    * the portable 60-bit md5 hash ([[graft.plans.Hash60]], proven
    * cell-exact against DuckDB's `('0x'||substr(md5(s),1,15))::BIGINT`
    * twin across the dedup family): bucket = top 12 hash bits, rank =
    * leading-zero count of the remaining 48 (computed as
    * `49 − length(bin(rest))` — exact integer logic in both engines),
    * and the estimator's register sum Σ 2^(−M_j) is carried as the EXACT
    * integer Σ 2^(49−M_j) (≤ 4096·2^49 < 2^63), so the only floating
    * arithmetic is one fixed chain of IEEE ops both engines evaluate
    * identically. The classic small-range linear-counting correction
    * applies below 2.5·m.
    *
    * Shuffle shape: registers are a two-level hash aggregation with
    * map-side combine — (group, bucket) max-rank partials, at most
    * m = 4096 rows per group per partition, regardless of input volume.
    * Register rows ARE the lake format: merging sketches along any
    * dimension afterwards is a plain `groupBy(..).max(hm)` — the HLL
    * union on the register lattice, with no engine-specific gadget (and
    * exact: max-merge then estimate ≡ estimate of the union by
    * construction).
    *
    * Value contract: `value` is canonicalized `cast("string")` before
    * hashing — pass integer/string columns (float formatting differs
    * across engines). */
  object PortableHll {
    val BucketBits = 12
    val Buckets: Int = 1 << BucketBits            // 4096
    val RankBits: Int = 60 - BucketBits           // 48
    private val RestMask = (1L << RankBits) - 1   // 2^48 − 1
    private val Scale = 1L << (RankBits + 1)      // 2^49: rank ≤ 49 stays integral

    /** Register rows `(groupCols..., hb, hm)`: max rank per
      * (group, hash-bucket). `groupCols` are (name, expression) pairs and
      * may be empty (one global sketch). */
    def registers(df: DataFrame, groupCols: Seq[(String, Column)],
                  value: Column): DataFrame =
      registerAgg(df, groupCols, value, withRowCount = false)

    /** [[registers]] plus an exact per-(group, hash-bucket) row count
      * `bn`: every input row lands in exactly one hash bucket, so
      * `sum(bn)` over `hb` equals `count(*)` per group — EXACT integers.
      * Lets an ingest that persists sketches AND plain row counts derive
      * both from ONE pass over the raw data instead of two full scans
      * (round-19, q107: the registers pass and the counts pass grouped by
      * the same keys and each re-read every event). */
    def registersWithRowCount(df: DataFrame, groupCols: Seq[(String, Column)],
                              value: Column): DataFrame =
      registerAgg(df, groupCols, value, withRowCount = true)

    private def registerAgg(df: DataFrame, groupCols: Seq[(String, Column)],
                            value: Column, withRowCount: Boolean): DataFrame = {
      graft.plans.Hash60.register(df.sparkSession)
      val h = call_function("graft_hash60", value.cast("string"))
      val rest = h.bitwiseAND(lit(RestMask))
      val rank = when(rest === 0, lit(RankBits + 1))
        .otherwise(lit(RankBits + 1) - length(bin(rest)))
      val sel = groupCols.map { case (n, c) => c.as(n) } ++
        Seq(shiftright(h, RankBits).as("hb"), rank.as("hr"))
      val grouped = df.select(sel: _*)
        .groupBy((groupCols.map(_._1) :+ "hb").map(col): _*)
      if (withRowCount) grouped.agg(max(col("hr")).as("hm"),
        count(lit(1)).as("bn"))
      else grouped.agg(max(col("hr")).as("hm"))
    }

    /** The estimator over register rows: one aggregation per group. */
    def estimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
      val grouped = regs.groupBy(keys.map(col): _*)
        .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${RankBits + 1} - hm)")).as("__s"),
          count(lit(1)).as("__nb"))
        .withColumn("__v", lit(Buckets.toLong) - col("__nb"))
        .withColumn("__n", col("__s") + col("__v") * lit(Scale))
      // one fixed chain of IEEE ops, spelled identically in the oracle:
      // alpha_m · m² · 2^49 / N, then linear counting below 2.5·m
      val eRaw = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0))) *
        lit(4096.0) * lit(4096.0) * lit(562949953421312.0) /
        col("__n").cast("double")
      grouped.withColumn("__eraw", eRaw)
        .withColumn("approx_distinct",
          round(when(col("__v") > 0 && col("__eraw") <= lit(2.5) * lit(4096.0),
            lit(4096.0) * log(lit(4096.0) / col("__v").cast("double")))
            .otherwise(col("__eraw")), 4))
        .drop("__s", "__nb", "__v", "__n", "__eraw")
    }
  }
}
