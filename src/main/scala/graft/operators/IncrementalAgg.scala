package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a keyed `(count, sums…)` table
  * current under arriving batches without ever re-reading history.
  *
  * The materialized-view-maintenance identity for distributive aggregates
  * (`count`/`sum`, and `avg` as `sum/count`): partially aggregate the BATCH
  * (map-side combine, one small shuffle over batch keys), then MERGE into
  * the aggregate table — matched keys add the partials, new keys insert.
  * Cost is O(batch + touched keys); the history's raw rows are never
  * touched. Combined with [[Merge.mergePartitionedTable]] the table-side
  * I/O is O(touched buckets) too — the standard shape for maintaining a
  * 100 TB-scale rollup under streaming/batch appends.
  */
object IncrementalAgg {

  /** Partial aggregate of one batch: `n_events` + one summed column per
    * entry in `sums` (output name → input expression). */
  def aggregateBatch(batch: DataFrame, keys: Seq[String],
                     sums: Map[String, Column]): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sums.toSeq.map { case (n, c) => sum(c).as(n) }: _*)

  /** Fold a batch's partial aggregate into the running table. */
  def update(table: DataFrame, batch: DataFrame, keys: Seq[String],
             sums: Map[String, Column]): DataFrame = {
    val partial = aggregateBatch(batch, keys, sums)
    val addCols = ("n_events" :: sums.keys.toList).map { c =>
      c -> (Merge.base(c) + Merge.src(c))
    }.toMap
    Merge.merge(table, partial, keys,
      matched = Seq(Merge.MatchedUpdate(addCols)),
      notMatched = Some(Merge.NotMatchedInsert()),
      sourcePriority = keys.map(col))
  }

  /** Convenience: seed from the first batch. */
  def init(batch: DataFrame, keys: Seq[String], sums: Map[String, Column]): DataFrame =
    aggregateBatch(batch, keys, sums)
}
