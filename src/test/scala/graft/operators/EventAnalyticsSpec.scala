package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EventAnalyticsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: ordered stages, out-of-order events don't count") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2 views then clicks, never purchases
      (2L, ts("2024-01-01 11:00:00"), "view"),
      (2L, ts("2024-01-01 11:01:00"), "click"),
      // u3 purchases BEFORE clicking: purchase must not count
      (3L, ts("2024-01-01 12:00:00"), "view"),
      (3L, ts("2024-01-01 12:01:00"), "purchase"),
      (3L, ts("2024-01-01 12:02:00"), "click"),
      // u4 only clicks (no view): no stage counts
      (4L, ts("2024-01-01 13:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")

    val out = EventAnalytics.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 3L, "click" -> 3L, "purchase" -> 1L))
  }

  test("cohort retention: day offsets from first activity") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-02 09:00:00")),
      (1L, ts("2024-01-04 09:00:00")),
      (2L, ts("2024-01-02 12:00:00")), (2L, ts("2024-01-03 01:00:00")),
      (3L, ts("2024-01-01 23:59:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(events, col("user_id"), col("ts"), "day")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L, // u1, u3 on their first day
      ("2024-01-01", 1L) -> 1L, // u1 back next day
      ("2024-01-01", 3L) -> 1L, // u1 back on day 3
      ("2024-01-02", 0L) -> 1L, // u2 first day
      ("2024-01-02", 1L) -> 1L  // u2 back next day
    ))
  }
}
