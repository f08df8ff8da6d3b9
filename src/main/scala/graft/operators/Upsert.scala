package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed last-writer-wins upsert — the reference's core load primitive
  * (`bulk_upsert`, reference etl/load.py:30-52: one
  * `INSERT .. ON CONFLICT (key) DO UPDATE` per table).
  *
  * Spark has no built-in MERGE on plain parquet, so the operator is expressed
  * relationally: `updates ∪ (base ⟕anti updates)` — the updated rows win, base
  * rows survive only when their key is absent from the batch.
  *
  * Scale notes (100 TB base, small-to-medium update batches):
  *  - the anti-join is the only shuffle; when `updates` is small (the common
  *    incremental-batch case) Catalyst/AQE turns it into a broadcast anti-join
  *    so the base table is never shuffled — `upsert` calls `broadcast()` on
  *    the key set explicitly when `hintBroadcast` is set.
  *  - updates are defensively deduped by key first: Postgres `ON CONFLICT`
  *    errors when one statement carries duplicate keys (reference relies on a
  *    prior dedup step); we make the operator total instead (last-writer-wins
  *    within the batch via the caller-supplied priority order).
  */
object Upsert {

  /** Relational upsert: rows of `updates` replace same-key rows of `base`.
    * `updatePriority` orders duplicate-key rows *within* the batch (first in
    * this order wins), keeping the result deterministic. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             updatePriority: Seq[Column], hintBroadcast: Boolean = true): DataFrame = {
    val batch = dedupBatch(updates, keys, updatePriority)
    val keySet = batch.select(keys.map(col): _*)
    val keep = base.join(if (hintBroadcast) broadcast(keySet) else keySet, keys, "left_anti")
    batch.unionByName(keep)
  }

  /** True when `min(struct(...))` can order a value of this type — MapType
    * (and Variant) cannot participate in an ordering, which rules out the
    * aggregate dedup form below. */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => false
    case _: org.apache.spark.sql.types.VariantType => false
    case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
    case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => orderable(f.dataType))
    case _ => true
  }

  /** Batch-level last-writer-wins dedup for the upsert sinks.
    *
    * When the priority is plain ascending columns and every payload column
    * is orderable, use the AGGREGATE form ([[Dedup.exact]]): hash
    * aggregation with map-side partial combine, so the shuffle carries
    * ~one candidate per key per input partition instead of dragging the
    * whole batch through a window sort — the difference between shuffling
    * 10M rows and shuffling the key cardinality on a wide micro-batch.
    * Every row the aggregate form keeps is minimal in the same priority
    * order, i.e. a legal outcome of the window form (which breaks priority
    * ties arbitrarily), so upsert semantics are unchanged — in fact the
    * aggregate form is MORE deterministic (ties fall through to the
    * payload ordering). Falls back to the window form for `.asc`/`.desc`
    * mixes or non-orderable payloads (maps, variants). */
  private[operators] def dedupBatch(updates: DataFrame, keys: Seq[String],
                                    priority: Seq[Column]): DataFrame =
    if (priority.forall(c => !org.apache.spark.sql.graft.ColumnInternals.isSortOrder(c)) &&
        updates.schema.fields.forall(f => orderable(f.dataType)))
      Dedup.exact(updates, keys, priority)
    else Dedup.firstWins(updates, keys, priority)

  /** Hash-bucket column used by the partitioned upsert layout. */
  val BucketCol = "__graft_bucket"

  /** Marker file recording the bucket count a layout was written with
    * (underscore prefix → ignored by parquet file listing). */
  val BucketMarker = "_graft_buckets"

  /** Writer-lock marker ENFORCING the parquet warehouse's single-writer
    * contract (round-15; the JDBC paths are transactional, the parquet
    * paths were contract-by-documentation only — two concurrent pipeline
    * runs could interleave bucket swaps). Underscore prefix → ignored by
    * parquet file listing. */
  val LockMarker = "_graft_writer_lock"

  /** Run `body` holding the exclusive writer lock on the table at `path`.
    * A second concurrent writer FAILS LOUDLY (IllegalStateException naming
    * the holder) instead of corrupting the layout — writers must be
    * serialized by the caller; this turns a silent interleaving into a
    * defined outcome. The lock is a create-exclusive marker file (atomic
    * namenode op on HDFS; see [[graft.util.Fs.createExclusive]]) and is
    * removed on completion, success or failure. A writer that DIES without
    * cleanup leaves a stale lock: recovery is [[releaseLock]] (manual,
    * deliberate — the lock content names the holder pid/timestamp so an
    * operator can check it is truly dead), after which re-running the
    * batch is safe because every partitioned write is idempotent-replay
    * (staging materializes fully before any swap). */
  private[operators] def withWriterLock[T](
      path: String, conf: org.apache.hadoop.conf.Configuration)(body: => T): T = {
    val lock = s"$path/$LockMarker"
    val info = s"pid=${ProcessHandle.current().pid()} " +
      s"host=${java.net.InetAddress.getLocalHost.getHostName} " +
      s"ts=${java.time.Instant.now()} nonce=${java.util.UUID.randomUUID()}"
    if (!graft.util.Fs.createExclusive(lock, info, conf))
      throw new IllegalStateException(
        s"concurrent writer on $path: lock held by " +
          s"(${graft.util.Fs.readMarker(lock, conf).getOrElse("unreadable")}). " +
          "The parquet warehouse is single-writer per table: serialize " +
          "upsert/merge/compact calls, or — after verifying the holder is a " +
          "crashed writer — clear the stale lock with Upsert.releaseLock and " +
          "re-run the batch (partitioned writes replay idempotently).")
    try body
    finally {
      // release ONLY our own lock: the wholesale-swap paths (upsertTable,
      // the migrate branch) replace the table directory — lock included —
      // as their final act, and a successor may have locked the fresh
      // directory before this finally runs. The nonce makes ownership
      // checkable; a non-matching lock belongs to that successor.
      if (graft.util.Fs.readMarker(lock, conf).contains(info))
        graft.util.Fs.deleteRecursively(lock, conf)
    }
  }

  /** Remove a stale writer lock left by a crashed writer. Deliberately
    * manual: the caller asserts the holder named in the lock is dead. */
  def releaseLock(spark: SparkSession, path: String): Unit =
    graft.util.Fs.deleteRecursively(s"$path/$LockMarker",
      spark.sparkContext.hadoopConfiguration)

  /** True when `path` holds table content beyond the writer lock (the lock
    * file itself creates the directory, so bare existence is not enough). */
  private def hasTableContent(
      path: String, conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName != LockMarker)
  }

  /** Upsert into a HASH-PARTITIONED keyed parquet table — the 100 TB shape.
    *
    * [[upsertTable]] rewrites the whole table per batch, which is correct but
    * O(table) I/O; at scale the table must be laid out so a batch only
    * touches the data it changes. Layout: parquet partitioned by
    * `pmod(hash(keys), numBuckets)`. A batch's keys hash to a set of buckets
    * B; the merge reads ONLY those partitions (partition-pruned scan),
    * anti-joins, writes the merged buckets to a staging dir, then swaps each
    * touched bucket directory into place. I/O is O(|touched buckets| ×
    * bucket size), independent of total table size.
    *
    * All filesystem ops go through the Hadoop `FileSystem` resolved from the
    * path (hdfs://, s3a://, file:// all work). The single-writer contract is
    * ENFORCED by [[withWriterLock]]: a second concurrent writer fails loudly
    * rather than interleaving bucket swaps. Crash recovery under that
    * contract: the staging write materializes fully before any
    * target bucket is replaced, so a crash mid-swap leaves some buckets
    * updated and some not — clear the stale lock ([[releaseLock]]) and
    * re-run the same batch: the upsert is idempotent and
    * heals the table (the upsert of an already-applied batch is a no-op
    * merge). */
  def upsertPartitionedTable(spark: SparkSession, path: String, updates: DataFrame,
                             keys: Seq[String], updatePriority: Seq[Column],
                             numBuckets: Int = 64): Unit =
    withWriterLock(path, spark.sparkContext.hadoopConfiguration) {
      upsertPartitionedTableLocked(spark, path, updates, keys, updatePriority, numBuckets)
    }

  private def upsertPartitionedTableLocked(
      spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], updatePriority: Seq[Column], numBuckets: Int): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    // dedup ONCE and persist: the deduped batch feeds up to three plans
    // (touched-bucket collect, the anti-join's broadcast key set, the merged
    // union) — without the persist each would replay the full batch dedup,
    // tripling the dominant cost of a wide micro-batch (the q96 floor).
    val withBucket = dedupBatch(updates, keys, updatePriority)
      .withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(numBuckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // layout detection is filesystem-level: partition dirs named
    // "__graft_bucket=N". A flat dir (even an empty pre-created table) must
    // be fully migrated — mixing root files with partition dirs is a
    // conflicting layout for partition discovery. The bucket COUNT the
    // layout was written with lives in a marker file: merging with a
    // different modulus would leave stale same-key rows in un-touched
    // buckets, so a count mismatch forces a full re-bucket migration.
    // lock-aware existence: the writer lock itself creates the directory,
    // so "table exists" must mean "has content beyond the lock marker"
    val tableExists = hasTableContent(path, conf)
    val bucketed = graft.util.Fs.hasChildDirWithPrefix(path, BucketCol + "=", conf)
    val markerPath = s"$path/$BucketMarker"
    val layoutBuckets = graft.util.Fs.readMarker(markerPath, conf).map(_.toInt)

    def writePartitioned(df: DataFrame, target: String): Unit = {
      df.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(target)
      graft.util.Fs.writeMarker(s"$target/$BucketMarker", numBuckets.toString, conf)
    }

    def migrate(base: DataFrame): Unit = {
      // tmp + swap; the write must materialize before source files go away
      val rebucketed = base.withColumn(BucketCol,
        pmod(hash(keys.map(col): _*), lit(numBuckets)))
      val merged = withBucket.unionByName(
        rebucketed.join(broadcast(withBucket.select(keys.map(col): _*)), keys, "left_anti"))
      val tmp = path + ".__graft_tmp"
      writePartitioned(merged, tmp)
      graft.util.Fs.swapInto(tmp, path, conf)
    }

    if (bucketed && layoutBuckets.contains(numBuckets)) {
      // incremental: read + rewrite ONLY the touched buckets
      val buckets = withBucket.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq
      val base = spark.read.parquet(path)
        .filter(col(BucketCol).isin(buckets: _*)) // partition-pruned
      val merged = withBucket.unionByName(
        base.join(broadcast(withBucket.select(keys.map(col): _*)), keys, "left_anti"))
      // stage the touched buckets fully, then swap each bucket dir into the
      // live table — never overwrite a directory while a job reads from it
      val tmp = path + ".__graft_tmp"
      merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol).parquet(tmp)
      graft.util.Fs.childDirsWithPrefix(tmp, BucketCol + "=", conf).foreach { bucketDir =>
        graft.util.Fs.swapInto(s"$tmp/$bucketDir", s"$path/$bucketDir", conf)
      }
      graft.util.Fs.deleteRecursively(tmp, conf)
    } else if (bucketed) {
      // bucket-count change (or pre-marker layout): full re-bucket
      migrate(spark.read.parquet(path).drop(BucketCol))
    } else if (tableExists) {
      // legacy flat table → bucketed layout
      migrate(spark.read.parquet(path))
    } else {
      writePartitioned(withBucket, path)
    }
    } finally withBucket.unpersist()
  }

  /** Read back a partitioned keyed table without the layout column.
    *
    * `schema` (data columns only — the layout column is appended and
    * re-dropped here) makes the read total on an EMPTY table: a zero-row
    * partitioned write leaves only markers, and a schema-inferring read
    * of that directory dies with UNABLE_TO_INFER_SCHEMA instead of
    * returning the empty frame a downstream gate wants to count. */
  def readPartitionedTable(spark: SparkSession, path: String,
                           schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(
        s.add(BucketCol, org.apache.spark.sql.types.IntegerType)))
      .parquet(path).drop(BucketCol)

  /** Upsert into a parquet-backed keyed table at `path`, creating it when
    * absent. Single-writer, ENFORCED by [[withWriterLock]]: writes to a
    * temp dir then swaps, mirroring the reference's single-transaction load
    * (reference etl/load.py:50-51). NOTE: the final swap replaces the table
    * directory wholesale (the in-flight lock marker goes with it — by then
    * the write is complete and the lock has nothing left to protect). */
  def upsertTable(spark: SparkSession, path: String, updates: DataFrame,
                  keys: Seq[String], updatePriority: Seq[Column]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    withWriterLock(path, conf) {
      val merged =
        if (hasTableContent(path, conf))
          upsert(spark.read.parquet(path), updates, keys, updatePriority)
        else Dedup.firstWins(updates, keys, updatePriority)
      val tmp = path + ".__graft_tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      graft.util.Fs.swapInto(tmp, path, conf)
    }
  }
}
