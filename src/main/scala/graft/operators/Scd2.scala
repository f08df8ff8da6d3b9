package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: dimension rows are versioned instead
  * of overwritten — history survives upserts, and a fact row can always be
  * joined to the attribute values that were CURRENT at its event time
  * (`valid_from <= ts < valid_to`).
  *
  * Table shape: key + attribute columns + `valid_from` (version the row
  * appeared), `valid_to` (version it was superseded; null = open) and
  * `is_current`. [[apply]] folds one batch in:
  *
  *  - rows whose key is absent → inserted open at `version`;
  *  - rows whose attributes EQUAL the current version → no-op (no new
  *    version, no churn — the common case in a daily dim refresh);
  *  - rows whose attributes differ → the current version closes
  *    (`valid_to = version`), a new open version inserts.
  *
  * One equi-join of current rows against the batch + unions: no window, no
  * per-key iteration, closed/history rows stream through untouched. At
  * warehouse scale pair this with the bucketed layout so the join reads
  * only touched buckets (the dim's current slice is also typically small
  * enough to broadcast).
  */
object Scd2 {

  /** Evolve `dim` (an SCD2 table, possibly empty/None) with `batch`
    * (key + attribute columns) at `version`. Attribute comparison is
    * null-safe on `attrs`. Duplicate batch keys collapse deterministically
    * (first in `batchPriority` order wins, like [[Merge]]) — two open
    * versions of one key would silently fan out every later as-of join. */
  def apply(dim: Option[DataFrame], batch0: DataFrame, keys: Seq[String],
            attrs: Seq[String], version: Long,
            batchPriority: Option[Seq[Column]] = None): DataFrame = {
    val batch = Dedup.firstWins(batch0, keys,
      batchPriority.getOrElse(keys.map(col)))
    val opened = batch.select((keys ++ attrs).map(col): _*)
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    dim match {
      case None => opened
      case Some(d) =>
        val current = d.filter(col("is_current"))
        val history = d.filter(!col("is_current"))
        val b = batch.select((keys ++ attrs).map(c => col(c).as(s"__b_$c")): _*)
        val joinCond = keys.map(k => col(k) === col(s"__b_$k")).reduce(_ && _)
        val changed = attrs.map(a => !(col(a) <=> col(s"__b_$a"))).reduce(_ || _)

        val cur = current.join(b, joinCond, "left")
        val stillCurrent = cur
          .filter(col(s"__b_${keys.head}").isNull || !changed)
          .select(d.columns.map(col): _*)
        val closed = cur
          .filter(col(s"__b_${keys.head}").isNotNull && changed)
          .select(d.columns.map(col): _*)
          .withColumn("valid_to", lit(version))
          .withColumn("is_current", lit(false))

        // batch rows that open a new version: new keys, or keys whose
        // current attrs differ. A marker column distinguishes "no current
        // row" from "current attr is null".
        val curKeyed = current.select(
          (keys.map(col) ++ attrs.map(c => col(c).as(s"__c_$c")) :+
            lit(true).as("__c_exists")): _*)
        val withCur = opened.join(curKeyed, keys, "left")
        val curChanged = attrs.map(a => !(col(a) <=> col(s"__c_$a"))).reduce(_ || _)
        val newVersions = withCur
          .filter(col("__c_exists").isNull || curChanged)
          .select(opened.columns.map(col): _*)

        history.unionByName(stillCurrent).unionByName(closed).unionByName(newVersions)
    }
  }
}
