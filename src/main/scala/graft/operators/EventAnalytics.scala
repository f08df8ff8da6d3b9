package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics: ordered funnels and cohort retention — the
  * product-analytics queries an events warehouse must answer.
  *
  * [[funnel]]: users reaching each stage of an ORDERED event sequence
  * (stage k counts only events strictly after the user's stage-k−1 time —
  * a view→click→purchase funnel doesn't credit a purchase that preceded
  * the click). Shape: one `min(ts)` aggregation per stage, each joined to
  * the previous stage's (user, ts) frame. Stage frames shrink
  * monotonically, every join is keyed on the user — at scale the later
  * stages broadcast. No window over the full event stream.
  *
  * [[cohortRetention]]: users grouped by first-activity period; for each
  * (cohort, offset) the count of cohort users active that period. Two
  * aggregations and a keyed join.
  */
object EventAnalytics {

  /** Per-stage reach of the ordered `stages`. Output: `(stage_idx,
    * stage_name, n_users)`, stage_idx ascending, each user counted in a
    * stage only if they hit every earlier stage first. */
  def funnel(events: DataFrame, user: Column, ts: Column, eventType: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel requires at least one stage")
    val base = events.select(user.as("user_id"), ts.as("ts"), eventType.as("et"))
    // fold: frame of (user_id, stage_ts) for users who reached stage k
    val frames = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val stageEvents = base.filter(col("et") === stage)
        val reached = prev match {
          case None => stageEvents
          case Some(p) =>
            stageEvents.join(p.select(col("user_id"), col("stage_ts").as("__prev_ts")), "user_id")
              .filter(col("ts") > col("__prev_ts"))
        }
        Some(reached.groupBy("user_id").agg(min(col("ts")).as("stage_ts")))
    }.flatten
    frames.zip(stages).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(name).as("stage_name"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Cohort retention at `period` granularity ("day", "hour", …):
    * `(cohort_period, period_offset, n_users)` where offset counts periods
    * since the cohort's first activity. */
  def cohortRetention(events: DataFrame, user: Column, ts: Column,
                      period: String = "day"): DataFrame = {
    val base = events.select(user.as("user_id"), date_trunc(period, ts).as("p"))
    val firstSeen = base.groupBy("user_id").agg(min(col("p")).as("cohort_period"))
    val active = base.distinct()
    val offsetExpr = period match {
      case "day"  => datediff(col("p").cast("date"), col("cohort_period").cast("date")).cast("long")
      case "hour" => ((col("p").cast("long") - col("cohort_period").cast("long")) / 3600L).cast("long")
      case other  => throw new IllegalArgumentException(s"unsupported period: $other")
    }
    active.join(firstSeen, "user_id")
      .select(col("cohort_period"), offsetExpr.as("period_offset"))
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
