package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a dense
  * per-key time grid, filling gaps the raw data never materialized.
  *
  * The reference aggregates observations by (indicator, year) and simply
  * has no row where no observation exists (reference etl/load.py upserts
  * only observed facts); every downstream consumer that wants "a value for
  * every period" — charting, rolling statistics, training-curriculum
  * schedules over time-bucketed corpora — needs the dense grid. This
  * operator produces it declaratively:
  *
  *  1. bucket-level aggregation: `date_trunc(unit, ts)` → one hash
  *     aggregation with map-side combine — the only pass over the raw
  *     events. At 100 TB this is the data-sized stage; everything after
  *     runs on bucket-level rows (|keys| × |buckets|, orders of magnitude
  *     smaller).
  *  2. per-key spine: min/max bucket per key, `sequence()` + `explode`
  *     generates the dense grid executor-side — never a driver loop, never
  *     a cross join against a calendar table.
  *  3. left join grid ← aggregates on (key, bucket), gaps become
  *     `n_events = 0` and a null bucket value.
  *  4. forward fill: `last(ignoreNulls)` over a per-key ordered window
  *     carries the most recent observed value across gaps.
  *
  * Shuffle shape: the raw-data aggregation is one exchange on
  * (key, bucket); the spine aggregation, grid join and fill window all
  * operate on bucket-level rows and share `key`-compatible partitioning.
  * A pathological key spanning years of hourly buckets fans out to ~10k
  * grid rows per key — still bucket-scale, never event-scale.
  *
  * Determinism: the bucket value is rounded to 4 decimals BEFORE the fill,
  * so the forward-filled value is bit-portable cross-engine (the DuckDB
  * twin fills with `last_value(x IGNORE NULLS)` over the same grid).
  */
object TimeSeries {

  /** Dense per-key grid at `unit` granularity over each key's observed
    * [min, max] bucket span.
    *
    * Output: `(key, bucket, n_events, bucket_value, value_ffill)` —
    * `n_events` is 0 on gap rows, `bucket_value` is the rounded per-bucket
    * sum (null on gaps), `value_ffill` carries the last observed value
    * forward (null until the key's first observed bucket).
    *
    * @param unit a `date_trunc` unit that is also a valid interval step:
    *             "hour", "day", "week" (lowercase).
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
               unit: String = "hour"): DataFrame = {
    require(Seq("hour", "day", "week").contains(unit),
      s"unsupported resample unit '$unit' (need hour/day/week)")
    val bucketed = df.groupBy(col(keyCol),
        date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 4).as("bucket_value"))
    val spine = bucketed.groupBy(col(keyCol))
      .agg(min("bucket").as("mn"), max("bucket").as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr(s"interval 1 $unit")))
          .as("bucket"))
    val fill = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("bucket_value"),
        last(col("bucket_value"), ignoreNulls = true).over(fill)
          .as("value_ffill"))
  }
}
