package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Per-column statistics profile — the ANALYZE/profiling surface a
  * warehouse load wants after ingest: one row per profiled column with
  * `(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)`.
  *
  * Plan shape: one keyless pass over the data computes count / per-column
  * null counts / typed min-max (partial aggregation per partition, a
  * #columns-wide single-row merge — no shuffle of data rows). Distinct
  * counts NEVER go through a fused multi-distinct aggregation: that plans
  * an Expand (one projection per distinct column, #columns × row
  * replication) and — because min/max over string/timestamp columns have
  * var-length buffers that disqualify hash aggregation — a SortAggregate
  * with a full Sort of the expanded rows (measured 2.5s vs 0.9s at sf0.1
  * on 4 columns of `orders`). Instead:
  *
  *  - `exactDistinct = true` (the oracle path): one narrow
  *    `select(c).distinct().count()` job per column — map-side partial
  *    dedup, a shuffle of unique values only — all submitted CONCURRENTLY
  *    with the base pass (independent jobs; a cluster schedules them in
  *    parallel, and each remains fully distributed).
  *  - `exactDistinct = false` (the 100 TB path): HLL
  *    (`approx_count_distinct`) rides in the SAME keyless pass — truly
  *    one scan, fixed-size sketch buffers, no Expand, no extra jobs.
  *
  * The final K-row assembly is driver-side but bounded by the profiled
  * column count (the same bounded-cardinality collect contract as the
  * ANN centroid paths), never by data size.
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

    val baseAggs = count(lit(1)).as("__n") +: (cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
      asText(min(col(c)), c).as(s"__min_$c"),
      asText(max(col(c)), c).as(s"__max_$c"))) ++
      (if (exactDistinct) Nil
       else cols.map(c => approx_count_distinct(col(c)).as(s"__distinct_$c"))))

    // the base pass and the per-column distinct jobs are independent —
    // submit everything, let the scheduler overlap
    val wideF = Future(df.agg(baseAggs.head, baseAggs.tail: _*).head())
    val distinctF =
      if (exactDistinct)
        // isNotNull pre-filter: COUNT(DISTINCT c) ignores NULLs, but the
        // null group would survive distinct() as a row of its own
        Future.sequence(cols.map(c =>
          Future(c -> df.select(col(c)).where(col(c).isNotNull)
            .distinct().count())))
      else Future.successful(Nil)
    val wide = Await.result(wideF, Duration.Inf)
    val exactCounts = Await.result(distinctF, Duration.Inf).toMap

    def longAt(name: String): Long = {
      val i = wide.fieldIndex(name)
      if (wide.isNullAt(i)) 0L else wide.getLong(i)
    }
    val out = cols.map { c =>
      (c, longAt("__n"), longAt(s"__nulls_$c"),
        if (exactDistinct) exactCounts(c) else longAt(s"__distinct_$c"),
        wide.getAs[String](s"__min_$c"), wide.getAs[String](s"__max_$c"))
    }
    import df.sparkSession.implicits._
    out.toDF("column_name", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value")
  }
}
