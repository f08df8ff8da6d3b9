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
}
