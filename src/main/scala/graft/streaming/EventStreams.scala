package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only but carries explicit incremental machinery
  * (checkpoint/resume, SURVEY.md §2.10); this module is the streaming-native
  * expression of that contract: the same aggregations as the batch queries,
  * run incrementally with watermarked state. Works identically on a file
  * stream, Kafka source, or rate source — the transforms only see a streaming
  * DataFrame. */
object EventStreams {

  /** Streaming twin of q14_hourly_windows: tumbling event-time windows with
    * a 10-minute watermark bounding state. In append mode a window emits
    * once the watermark passes its end — state is O(open windows), not
    * O(stream length), which is what makes this run forever at scale. */
  def hourlyWindowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserSession(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long,
      total_value: Double)
  // public: the streaming state store serializes this via a codegen'd
  // encoder, and Janino cannot reach a private nested constructor
  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Streaming incremental load: each micro-batch upserts into a keyed,
    * hash-bucket-partitioned warehouse table via foreachBatch — the
    * streaming-native form of the reference's per-run idempotent load
    * (SURVEY.md §2.10 "incremental-contract equivalent"). Exactly-once
    * per-key effect: reprocessed batches overwrite the same keys, so
    * at-least-once delivery composes into idempotent state. Returns the
    * started query; callers own the trigger/termination. */
  def upsertStream(events: org.apache.spark.sql.DataFrame, tablePath: String,
                   checkpointDir: String, keys: Seq[String],
                   numBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.Upsert.upsertPartitionedTable(
          batch.sparkSession, tablePath, batch,
          keys, keys.map(col), numBuckets)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup: drop rows whose `keyCols` were already seen
    * within the watermark horizon — the streaming form of the exact-dedup
    * family (D1/q19), with state BOUNDED by the watermark delay instead of
    * growing with the stream (`dropDuplicates` on a stream never evicts).
    * At-least-once sources (file streams, Kafka replays) become
    * effectively-once for any consumer keyed on `keyCols`. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts",
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming incremental load into a TRANSACTIONAL JDBC warehouse: each
    * micro-batch runs through [[graft.operators.JdbcUpsert]] (parallel
    * staging write + one-transaction merge), so at-least-once micro-batch
    * delivery composes into idempotent per-key state — the streaming form
    * of the reference's ON CONFLICT load, against its actual storage shape. */
  def upsertStreamJdbc(events: org.apache.spark.sql.DataFrame, url: String, table: String,
                       checkpointDir: String, keys: Seq[String],
                       dialect: graft.operators.JdbcUpsert.Dialect =
                         graft.operators.JdbcUpsert.PostgresOnConflict,
                       props: java.util.Properties = new java.util.Properties(),
                       stagingOptions: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.JdbcUpsert.upsert(batch, url, table, keys,
          dialect = dialect, props = props, stagingOptions = stagingOptions)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming materialized rollup: maintain a keyed `(count, sums…)`
    * aggregate table under a stream via [[graft.operators.IncrementalAgg]]
    * partials MERGEd into the bucketed parquet layout — the streaming form
    * of incremental view maintenance.
    *
    * Unlike the upsert sinks, the merge ADDS partials on matched keys, so
    * replay safety cannot come from overwriting: every row carries
    * `__graft_last_batch`, and the matched clause folds a partial ONLY
    * when its batch id is newer than the row's (IncrementalAgg
    * `replayGuard`). A crashed run that swapped some buckets and not
    * others replays the batch; already-swapped keys no-op on the guard,
    * unswapped keys fold — per-key exactly-once without an atomic
    * multi-bucket commit. The `_graft_last_batch` marker is only a cheap
    * whole-batch skip (and parsed tolerantly: a torn marker means "don't
    * skip", never a crash loop). */
  def rollupStream(events: org.apache.spark.sql.DataFrame, tablePath: String,
                   checkpointDir: String, keys: Seq[String],
                   sums: Map[String, String], numBuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val marker = s"$tablePath/_graft_last_batch"
        val applied = graft.util.Fs.readMarker(marker, conf).flatMap(_.toLongOption)
        if (!applied.exists(_ >= batchId)) {
          val sumCols = sums.map { case (n, c) => n -> col(c) }
          val partial = graft.operators.IncrementalAgg
            .aggregateBatch(batch, keys, sumCols)
            .withColumn("__graft_last_batch", lit(batchId))
          if (graft.util.Fs.readMarker(
              s"$tablePath/${graft.operators.Upsert.BucketMarker}", conf).isEmpty) {
            graft.operators.Upsert.upsertPartitionedTable(spark, tablePath,
              partial, keys, keys.map(col), numBuckets)
          } else {
            val (matched, notMatched) = graft.operators.IncrementalAgg
              .mergeClauses(sums.keys, replayGuard = Some("__graft_last_batch"))
            graft.operators.Merge.mergePartitionedTable(spark, tablePath,
              partial, keys, matched, notMatched,
              sourcePriority = keys.map(col))
          }
          graft.util.Fs.writeMarker(marker, batchId.toString, conf)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Stream-static enrichment: left-join the stream against a (small)
    * dimension table, broadcast so each micro-batch is a map-side hash
    * join — no shuffle, no state store, and the dimension is re-resolved
    * per micro-batch (a dim refreshed on disk is picked up without
    * restarting the query; file-source dims re-list, which is the
    * behavior Structured Streaming documents for stream-static joins).
    * Left join: events with no dimension row pass through null-padded
    * rather than silently dropping (dead-letter routing can filter on the
    * null downstream). */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Watermarked stream-stream interval join: pair each left row with every
    * right row sharing `keys` whose `rightTs` lands in
    * `[leftTs, leftTs + horizon)` — attribution joins (view→purchase,
    * impression→click) in their streaming-native form.
    *
    * Both sides carry a watermark and the join condition bounds the
    * event-time relationship in BOTH directions, which is what lets Spark
    * evict buffered rows: left state is held `horizon + delay` past the
    * watermark, right state `delay` — O(horizon × arrival rate), never
    * O(stream). Without the time bound a stream-stream join must buffer
    * both streams forever.
    *
    * Output: keys (left side), then the two sides' non-key columns —
    * which must therefore be disjoint; pre-rename with `.select(...as...)`.
    * Inner join only: streaming outer joins emit null-padded rows on
    * watermark close, giving batch/stream result divergence this engine's
    * oracle contract (batch join == streamed join) deliberately avoids. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   horizon: String = "1 hour",
                   watermarkDelay: String = "10 minutes"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin requires at least one key column")
    val lVal = left.columns.filterNot(keys.contains).toSeq
    val rVal = right.columns.filterNot(keys.contains).toSeq
    val clash = lVal.intersect(rVal)
    require(clash.isEmpty,
      s"non-key columns must be disjoint, clash: ${clash.mkString(",")}")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("__gl")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("__gr")
    val keyCond = keys.map(k => col(s"__gl.$k") === col(s"__gr.$k")).reduce(_ && _)
    val timeCond = col(s"__gr.$rightTs") >= col(s"__gl.$leftTs") &&
      col(s"__gr.$rightTs") < col(s"__gl.$leftTs") + expr(s"INTERVAL $horizon")
    l.join(r, keyCond && timeCond, "inner")
      .select(keys.map(k => col(s"__gl.$k")) ++
        lVal.map(c => col(s"__gl.$c")) ++ rVal.map(c => col(s"__gr.$c")): _*)
  }

  /** Gap-based sessionization with custom state (flatMapGroupsWithState):
    * a session closes when `gapMinutes` pass without an event for the user.
    * This is the KeyValueGroupedDataset custom-state path the built-in
    * windows can't express. State per user is O(1).
    *
    * A watermark is applied on `ts` here (EventTimeTimeout REQUIRES one on
    * a streaming Dataset — the query fails at start otherwise; on a batch
    * Dataset `withWatermark` is a no-op). Timeout timestamps are clamped
    * above the current watermark, since `setTimeoutTimestamp` throws for
    * values at or behind it (a session whose gap already elapsed times out
    * at the next watermark tick). */
  def sessionize(events: Dataset[UserEvent], gapMinutes: Int = 30,
                 watermarkDelay: String = "10 minutes") = {
    val gapMs = gapMinutes * 60 * 1000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[SessionState]) =>
          def toSession(s: SessionState) = UserSession(userId,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
            s.n, math.rint(s.total * 100) / 100)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = Seq.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // an in-gap event can still be OLDER than the session end
                  // (allowed-lateness reordering): never move `last` backward
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1,
                    s.total + e.value))
                case Some(s) =>
                  closed :+= toSession(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp above the watermark: setTimeoutTimestamp throws for
              // timestamps <= current watermark. In batch execution no
              // watermark is ever attached (withWatermark is a no-op on a
              // batch Dataset) and getCurrentWatermarkMs itself throws, so
              // fall back to -1 there and the clamp is a no-op.
              val wmMs = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(-1L)
              state.setTimeoutTimestamp(math.max(s.last + gapMs, wmMs + 1))
            }
            closed.iterator
          }
      }(Encoders.product[SessionState], Encoders.product[UserSession])
  }
}
