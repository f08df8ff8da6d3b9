package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates — the generalization of the reference's
  * post-load checks (reference dags/who_gho_etl_dag.py:189-206: row-count
  * gate + null-key gate, fail the run on violation).
  *
  * Each expectation compiles to an aggregate over one pass; `check` runs all
  * expectations against a frame in a SINGLE job (one scan, one collect) and
  * returns a per-expectation report. At 100 TB a DQ sweep is one extra scan,
  * not one scan per rule. */
object DataQuality {

  final case class Expectation(name: String, violations: Column)
  final case class Result(name: String, violations: Long) {
    def passed: Boolean = violations == 0
  }
  final case class Report(results: Seq[Result]) {
    def passed: Boolean = results.forall(_.passed)
    def failures: Seq[Result] = results.filterNot(_.passed)
  }

  /** A1: the frame must be non-empty. */
  def expectNonEmpty: Expectation =
    Expectation("non_empty", when(count(lit(1)) === 0, 1L).otherwise(0L))

  /** A2: columns must never be null. */
  def expectNoNulls(cols: String*): Expectation =
    Expectation(s"no_nulls(${cols.mkString(",")})",
      coalesce(sum(when(cols.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L)), lit(0L)))

  /** Key uniqueness: duplicate key rows count as violations. */
  def expectUnique(cols: String*): Expectation =
    Expectation(s"unique(${cols.mkString(",")})",
      count(lit(1)) - countDistinct(struct(cols.map(col): _*)))

  /** Value-domain rule: rows where `ok` is false or NULL violate. */
  def expectAll(name: String, ok: Column): Expectation =
    Expectation(name,
      coalesce(sum(when(!coalesce(ok, lit(false)), 1L).otherwise(0L)), lit(0L)))

  /** One-pass evaluation of all expectations. */
  def check(df: DataFrame, expectations: Seq[Expectation]): Report = {
    val row = df.agg(
      expectations.head.violations.as("e0"),
      expectations.tail.zipWithIndex.map { case (e, i) =>
        e.violations.as(s"e${i + 1}") }: _*
    ).head()
    Report(expectations.zipWithIndex.map { case (e, i) =>
      Result(e.name, row.getLong(i))
    })
  }

  /** J3: referential integrity — count of child keys absent from the parent
    * (needs a join, so it is its own job, not part of `check`'s single
    * pass). */
  def orphanCount(child: DataFrame, parent: DataFrame,
                  childKey: String, parentKey: String): Long =
    child.join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .count()

  /** Per-group z-score outlier summary: rows whose value sits more than
    * `z` sample standard deviations from their group mean, reported as
    * `(groupCol, n_outliers, max_z)`.
    *
    * Two passes (stats aggregate, then a broadcast join back over the
    * scan) — the distribution-drift / anomaly sweep a training-data
    * pipeline runs per ingest batch. The group-stats side is one row per
    * group, so the join back is a broadcast at any data scale as long as
    * GROUP cardinality stays broadcastable (drop the hint for
    * million-group frames and Spark falls back to a shuffled join).
    *
    * Cross-engine determinism: the mean and stddev are rounded to 4
    * decimals FIRST, so the gate `abs(value - mean_r) > z * sd_r` compares
    * doubles computed identically from exact decimal inputs in any engine —
    * the only float noise that can cross the oracle boundary is inside the
    * two roundings themselves (summation-order ulps, ~1e-13 relative,
    * versus a 1e-4 rounding grid). Groups with zero or null stddev (one
    * row, or constant value) have no outliers by definition. */
  def zscoreOutlierSummary(df: DataFrame, groupCol: String, valueCol: String,
                           z: Double = 3.0): DataFrame = {
    val stats = df.groupBy(groupCol).agg(
      round(avg(valueCol), 4).as("mean_r"),
      round(stddev_samp(valueCol), 4).as("sd_r"))
    df.join(broadcast(stats), groupCol)
      .filter(col("sd_r") > 0 &&
        abs(col(valueCol) - col("mean_r")) > lit(z) * col("sd_r"))
      .groupBy(groupCol).agg(
        count(lit(1)).as("n_outliers"),
        round(max(abs(col(valueCol) - col("mean_r")) / col("sd_r")), 4).as("max_z"))
  }

  /** Robust (median/MAD) outlier sweep — the companion to
    * [[zscoreOutlierSummary]] for skewed or already-contaminated
    * distributions, where outliers inflate the mean and stddev enough to
    * mask themselves (one 1e9 spike moves a 3-sigma gate by orders of
    * magnitude; it moves the median not at all).
    *
    * Per group: med = median(value), mad = median(|value − med|), and a
    * row is an outlier when its modified z-score
    * `0.6745 · |value − med| / mad` exceeds `z` (0.6745 ≈ Φ⁻¹(0.75) makes
    * the score comparable to a normal z; 3.5 is the Iglewicz–Hoaglin
    * default). Groups with mad = 0 (over half the values identical) are
    * skipped, matching the sd=0 guard above.
    *
    * Execution: two grouped median aggregations (Spark's exact `median`)
    * with the group-level stats broadcast back — three passes over the
    * data, no window over raw rows. Cross-engine determinism: med and mad
    * are rounded to 4 decimals BEFORE the gate, and the score is computed
    * as `abs · 0.6745 / mad` in exactly that order, so the DuckDB twin
    * reproduces the gate bit-for-bit.
    *
    * Output: `(group, n_outliers, max_robust_z)`. */
  def madOutlierSummary(df: DataFrame, groupCol: String, valueCol: String,
                        z: Double = 3.5): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(round(expr(s"median($valueCol)"), 4).as("med"))
    val withMed = df.join(broadcast(med), groupCol)
    val mad = withMed.groupBy(groupCol)
      .agg(round(expr(s"median(abs($valueCol - med))"), 4).as("mad"))
    val score = abs(col(valueCol) - col("med")) * lit(0.6745) / col("mad")
    withMed.join(broadcast(mad), groupCol)
      .filter(col("mad") > 0 && score > lit(z))
      .groupBy(groupCol).agg(
        count(lit(1)).as("n_outliers"),
        round(max(score), 4).as("max_robust_z"))
  }
}
