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

  /** Exponentially-weighted moving average over per-key bucketed series —
    * trend smoothing for drift monitoring (data-quality dashboards over
    * ingest volume, loss-curve-style signals over time-bucketed corpora).
    *
    * Input is an already-bucketed frame `(key, t, x)` (e.g. [[resample]]'s
    * rounded bucket sums): the recurrence `e_0 = x_0`,
    * `e_i = alpha·x_i + (1-alpha)·e_{i-1}` is inherently sequential, so it
    * runs as ONE codegen'd `aggregate` fold over each key's collected
    * series — per-key state is the series itself, which is bucket-scale
    * (a year of hours = 8.8k elements), never event-scale. Do NOT point
    * this at raw events; bucket first (that pass is the data-sized one and
    * it map-side combines).
    *
    * Output: `(key, t, x, ewma)`, `ewma` rounded to 4. Ordering inside a
    * key is by `t` via `sort_array` on the collected structs — `t` must be
    * unique per key (true for any `date_trunc` bucketing). */
  def ewma(bucketed: DataFrame, keyCol: String, tCol: String, xCol: String,
           alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val series = bucketed
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(tCol).as("t"), col(xCol).as("x"))))
        .as("__series"))
    // fold: acc is the array of smoothed points built so far; the lambda
    // reads acc's last element — O(n^2) array copying per key, fine at
    // bucket scale (documented above)
    val folded = series.withColumn("__ewma",
      aggregate(
        col("__series"),
        expr("CAST(array() AS ARRAY<STRUCT<t: TIMESTAMP, x: DOUBLE, ewma: DOUBLE>>)"),
        (acc, e) => {
          val prev = element_at(acc, -1)("ewma")
          val smoothed = when(size(acc) === 0, e("x"))
            .otherwise(lit(alpha) * e("x") + lit(1.0 - alpha) * prev)
          concat(acc, array(struct(e("t").as("t"), e("x").as("x"),
            smoothed.as("ewma"))))
        }))
    folded
      .select(col(keyCol), explode(col("__ewma")).as("__e"))
      .select(col(keyCol), col("__e.t").as(tCol), col("__e.x").as(xCol),
        round(col("__e.ewma"), 4).as("ewma"))
  }

  /** Exact rolling median over the trailing `width` buckets per key — the
    * outlier-robust twin of [[ewma]] (one spiked bucket drags a mean or
    * EWMA, not a median). Standard SQL has `median(...) OVER`, Spark does
    * not: here it's `collect_list` over the rows-window, `array_sort`, and
    * middle-element selection (avg of the two middles for even counts —
    * matching the SQL median). Window state is `width` doubles per row —
    * bounded by construction; the one shuffle is the per-key window sort,
    * which any trailing-window statistic pays.
    *
    * Output: `(key, t, x, rolling_median)` rounded to 4; input must be
    * null-free in `x` (bucketed aggregates are — SQL `median` skips nulls
    * where this would sort them, so parity requires none). */
  def rollingMedian(bucketed: DataFrame, keyCol: String, tCol: String,
                    xCol: String, width: Int = 5): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(-(width - 1), Window.currentRow)
    val sorted = array_sort(collect_list(col(xCol)).over(w))
    val n = size(sorted)
    // Column `/` is double division — truncate back to int indices
    // ((5+1)/2, 5/2+1) -> (3,3); ((4+1)/2, 4/2+1) -> (2,3)
    val mid = (element_at(sorted, ((n + 1) / 2).cast("int")) +
      element_at(sorted, (n / 2 + 1).cast("int"))) / 2.0
    bucketed.select(col(keyCol), col(tCol), col(xCol),
      round(mid, 4).as("rolling_median"))
  }
}
