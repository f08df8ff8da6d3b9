package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Per-column statistics profile — the ANALYZE/profiling surface a
  * warehouse load wants after ingest: one row per profiled column with
  * `(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)`.
  *
  * ONE pass over the data: every per-column aggregate is computed in a
  * single `agg` (Catalyst plans the distinct aggregates via Expand), then
  * the wide row is unpivoted driver-side into the per-column shape — no
  * per-column scans, no driver-side data movement beyond the single stats
  * row.
  *
  * `exactDistinct = true` uses COUNT(DISTINCT) — cross-engine-exact (the
  * oracle), but Expand multiplies the shuffled rows by the number of
  * profiled columns. At 100 TB profile with `exactDistinct = false`:
  * approx_count_distinct (HLL) keeps the pass at one shuffle with no
  * row multiplication, the standard trade for profiling jobs.
  *
  * min/max are stringified for a uniform output schema; floating columns
  * go through DECIMAL(28,6) first so the text form is engine-portable
  * (double→string scientific notation is not). */
object ColumnStats {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val fieldType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // stringify AFTER the typed aggregation — min/max must use the column's
    // own ordering, not the lexicographic ordering of its text form.
    // Floats go through DECIMAL(28,6) for engine-portable text, EXCEPT
    // NaN/±Inf/overflow, which the decimal cast rejects (ANSI error) —
    // profiling must survive exactly the messy columns it exists for, so
    // those fall back to the plain double rendering.
    def asText(e: Column, c: String): Column = fieldType(c) match {
      case DoubleType | FloatType =>
        val d = e.cast("double")
        when(d.isNull, lit(null).cast("string"))
          .when(isnan(d) || d === lit(Double.PositiveInfinity) ||
            d === lit(Double.NegativeInfinity) || abs(d) >= lit(1e22),
            d.cast("string"))
          .otherwise(d.cast("decimal(28,6)").cast("string"))
      case _ => e.cast("string")
    }
    def nDistinct(c: String): Column =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(col(c))

    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      nDistinct(c).as(s"__distinct_$c"),
      asText(min(col(c)), c).as(s"__min_$c"),
      asText(max(col(c)), c).as(s"__max_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the one wide row into (column_name, ...) rows — plan-side
    // (explode of a struct array), not a driver loop over data
    val entries = array(cols.map(c => struct(
      lit(c).as("column_name"),
      col("__n").as("n_rows"),
      coalesce(col(s"__nulls_$c"), lit(0L)).as("n_nulls"),
      col(s"__distinct_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"))): _*)
    wide.select(explode(entries).as("p")).select("p.*")
  }
}
