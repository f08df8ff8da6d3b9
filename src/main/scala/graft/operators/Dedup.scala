package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference dedups with pandas `drop_duplicates`, which keeps the first
  * occurrence in input order (reference etl/transform.py:45-48,67,78). Spark's
  * `dropDuplicates` keeps an *arbitrary* row per key, which is
  * nondeterministic under distributed execution — so the faithful primitive
  * here is a window + `row_number` with an explicit deterministic tiebreaker.
  *
  * Scale notes (100 TB): both variants shuffle once on the dedup key — the
  * minimum possible. `firstWins` uses a single window (one shuffle + in-
  * partition sort); `exact` uses hash aggregation (map-side partial combine,
  * so the shuffle only carries one row per key per input partition). Prefer
  * `exact` when any representative row will do; `firstWins` when
  * reproducibility of *which* row survives matters.
  */
object Dedup {

  /** Deterministic first-wins dedup: keeps, per key, the first row in
    * `order`. Mirrors pandas `drop_duplicates(subset=keys)` semantics given
    * an explicit ingest-order column (reference etl/transform.py:45-48). */
  def firstWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "firstWins needs keys and a deterministic order")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Exact dedup by key via hash aggregation: one surviving row per key with
    * `first` semantics on non-key columns made deterministic by min-struct.
    * Map-side combine makes this cheaper than a window at scale. */
  def exact(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    // min-struct can only express ASCENDING preference; a .asc/.desc
    // SortOrder inside struct() fails analysis. Fail fast with a usable
    // message instead (invert the column value, or use firstWins). The check
    // inspects the column's node tree, not its string rendering.
    require(!order.exists(org.apache.spark.sql.graft.ColumnInternals.isSortOrder),
      "Dedup.exact orders ascending only — pass plain columns (invert values " +
      "for descending preference) or use Dedup.firstWins for .asc/.desc ordering")
    val nonKey = df.columns.filterNot(keys.contains)
    // min over a struct ordered by (order..., nonKey...) picks a single
    // deterministic representative without a global sort. Order columns get
    // synthetic aliases so a column used both for ordering and as payload
    // doesn't make the struct fields ambiguous.
    //
    // A payload column that IS one of the order columns (q06 orders by
    // every non-key column) is NOT duplicated into the struct — the output
    // reads it back from its ordering slot (round-19). The surviving row
    // is identical: min(struct) only ever reaches a duplicated tail field
    // after the ordering prefix ties, and a prefix tie implies the
    // duplicate is tied too. Halving the struct matters because
    // min(struct) cannot hash-aggregate (non-fixed-width buffer →
    // SortAggregate): struct build + per-row lexicographic compare is the
    // map-side wall, and both scale with field count (q06 sf0.1: 20 → 11
    // fields).
    val orderSlot: Map[String, String] = order.zipWithIndex.flatMap {
      case (c, i) =>
        org.apache.spark.sql.graft.ColumnInternals.simpleAttributeName(c)
          .filter(nonKey.contains).map(_ -> s"__graft_o$i")
    }.toMap
    val packed = struct(
      order.zipWithIndex.map { case (c, i) => c.as(s"__graft_o$i") } ++
        nonKey.filterNot(orderSlot.contains).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(min(packed).as("__graft_rep"))
      .select(keys.map(col) ++ nonKey.map(c =>
        col(s"__graft_rep.${orderSlot.getOrElse(c, c)}").as(c)): _*)
  }

  /** Reference D1 rule (etl/transform.py:45-48): dedup by `idCol` when the
    * column exists and has any non-null value, else by `fallbackKeys`. The
    * condition is data-dependent, exactly as in the reference. */
  def byIdOrComposite(df: DataFrame, idCol: String, fallbackKeys: Seq[String],
                      order: Seq[Column]): DataFrame = {
    val useId = df.columns.contains(idCol) &&
      df.filter(col(idCol).isNotNull).limit(1).count() > 0
    if (useId) firstWins(df, Seq(idCol), order)
    else firstWins(df, fallbackKeys, order)
  }

  /** Quality-canonical dedup: per duplicate group, keep the member with
    * the HIGHEST score (ties → smallest id) — what production curation
    * actually does with a near-dup cluster (keep the cleanest/longest
    * copy, not whichever arrived first; the first-wins variants above
    * answer a different question, reproducible *ingest* order).
    *
    * `groups` is any (id, group) assignment — e.g.
    * [[TextDedup.minhashLshGroups]] — and `scores` any (id, score) frame
    * — e.g. [[TextAnalysis.qualityScore]]. The score must be
    * engine-portable (already rounded) for the kept set to be
    * cross-engine exact.
    *
    * Output: `(cluster_id, n_docs, kept_id, kept_score)`, one row per
    * group.
    *
    * Scale shape: one join of two id-keyed frames (same key — a single
    * exchange each side, and co-partitioned inputs skip even that), then
    * one hash aggregation on the group key with `max_by` over a
    * `(score, -id)` struct — map-side partial combine carries ONE
    * candidate per group per partition, never a window sort over
    * members. */
  def keepBestByScore(groups: DataFrame, scores: DataFrame,
                      idCol: String = "doc_id", groupCol: String = "cluster_id",
                      scoreCol: String = "quality_score"): DataFrame =
    groups.join(scores, idCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        max_by(struct(col(idCol).as("id"), col(scoreCol).as("s")),
          struct(col(scoreCol), -col(idCol))).as("__best"))
      .select(col(groupCol), col("n_docs"),
        col("__best.id").as("kept_id"), col("__best.s").as("kept_score"))
}
