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
        // Null-safe (<=>) key matching + a marker column, like
        // [[Merge.mergePreDeduped]]: with === a null-keyed current row
        // never matches its batch row, so every batch would insert another
        // open version while the old one stays is_current=true — duplicate
        // open rows that fan out every later as-of join. The marker also
        // distinguishes "no current row" from "matched row whose key is
        // null" (a null __b_<key> can mean either under <=>).
        val b = batch.select(
          ((keys ++ attrs).map(c => col(c).as(s"__b_$c")) :+
            lit(true).as("__b_exists")): _*)
        val joinCond = keys.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _)
        val changed = attrs.map(a => !(col(a) <=> col(s"__b_$a"))).reduce(_ || _)

        val cur = current.join(b, joinCond, "left")
        val stillCurrent = cur
          .filter(col("__b_exists").isNull || !changed)
          .select(d.columns.map(col): _*)
        val closed = cur
          .filter(col("__b_exists").isNotNull && changed)
          .select(d.columns.map(col): _*)
          .withColumn("valid_to", lit(version))
          .withColumn("is_current", lit(false))

        // batch rows that open a new version: new keys, or keys whose
        // current attrs differ. Null-safe on keys here too, for the same
        // reason as above.
        val curKeyed = current.select(
          ((keys ++ attrs).map(c => col(c).as(s"__c_$c")) :+
            lit(true).as("__c_exists")): _*)
        val curJoinCond = keys.map(k => col(k) <=> col(s"__c_$k")).reduce(_ && _)
        val withCur = opened.join(curKeyed, curJoinCond, "left")
        val curChanged = attrs.map(a => !(col(a) <=> col(s"__c_$a"))).reduce(_ || _)
        val newVersions = withCur
          .filter(col("__c_exists").isNull || curChanged)
          .select(opened.columns.map(col): _*)

        history.unionByName(stillCurrent).unionByName(closed).unionByName(newVersions)
    }
  }
}
