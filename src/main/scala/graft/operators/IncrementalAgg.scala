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

  /** The merge clause set that folds a partial into the table: matched
    * keys ADD the partials, new keys insert. With `replayGuard` (a version
    * column carried on both sides), a matched row only folds when the
    * incoming version is NEWER — a replayed partial becomes a per-key
    * no-op, which is what makes the additive merge safe under
    * at-least-once delivery and partial bucket swaps. */
  def mergeClauses(sumCols: Iterable[String], replayGuard: Option[String] = None)
      : (Seq[Merge.MatchedAction], Option[Merge.NotMatchedInsert]) = {
    val add = ("n_events" :: sumCols.toList).map { c =>
      c -> (Merge.base(c) + Merge.src(c))
    }.toMap
    val set = replayGuard.fold(add)(g => add + (g -> Merge.src(g)))
    val cond = replayGuard.map(g => Merge.src(g) > Merge.base(g))
    (Seq(Merge.MatchedUpdate(set, cond)), Some(Merge.NotMatchedInsert()))
  }

  /** Fold a batch's partial aggregate into the running table. */
  def update(table: DataFrame, batch: DataFrame, keys: Seq[String],
             sums: Map[String, Column]): DataFrame = {
    val partial = aggregateBatch(batch, keys, sums)
    val (matched, notMatched) = mergeClauses(sums.keys)
    Merge.merge(table, partial, keys, matched, notMatched,
      sourcePriority = keys.map(col))
  }

  /** Convenience: seed from the first batch. */
  def init(batch: DataFrame, keys: Seq[String], sums: Map[String, Column]): DataFrame =
    aggregateBatch(batch, keys, sums)
}
