package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Delta-style MERGE on plain DataFrames / the partitioned parquet layout.
  *
  * Generalizes [[Upsert]] (the reference's `INSERT .. ON CONFLICT DO UPDATE`,
  * reference etl/load.py:30-52) to the full three-clause MERGE shape a
  * warehouse user expects:
  *
  *   WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE
  *   WHEN NOT MATCHED [AND cond] THEN INSERT ...
  *
  * Clause semantics follow Delta/ANSI MERGE: matched clauses are evaluated
  * in declaration order and the FIRST clause whose condition holds applies;
  * a matched base row that satisfies no clause is kept unchanged; a source
  * row with no base match inserts only when the not-matched clause (if any)
  * accepts it. The source batch is deduped by key first (first-wins by
  * `sourcePriority`), making the operator total where ANSI MERGE would raise
  * a cardinality violation.
  *
  * Scale shape: ONE full-outer shuffle join on the merge keys — no
  * driver-side row handling, no per-clause passes (clause dispatch is a
  * single projected CASE). For the 100 TB table, [[mergePartitionedTable]]
  * applies the same relational core to ONLY the hash buckets the batch
  * touches (partition-pruned read + per-bucket swap, same layout contract as
  * [[Upsert.upsertPartitionedTable]]), so I/O is O(touched buckets), not
  * O(table).
  */
object Merge {

  /** Reference the base-side value of column `c` in clause conditions/sets. */
  def base(c: String): Column = col(s"$BaseStruct.$c")

  /** Reference the source-side value of column `c` in clause conditions/sets. */
  def src(c: String): Column = col(s"$SrcStruct.$c")

  sealed trait MatchedAction { def condition: Option[Column] }

  /** WHEN MATCHED [AND condition] THEN UPDATE SET set(col) — columns absent
    * from `set` keep their base value. */
  final case class MatchedUpdate(set: Map[String, Column],
                                 condition: Option[Column] = None) extends MatchedAction

  /** WHEN MATCHED [AND condition] THEN DELETE. */
  final case class MatchedDelete(condition: Option[Column] = None) extends MatchedAction

  /** WHEN NOT MATCHED [AND condition] THEN INSERT — by default the full
    * source row; `values` overrides individual columns. */
  final case class NotMatchedInsert(condition: Option[Column] = None,
                                    values: Map[String, Column] = Map.empty)

  private val BaseStruct = "__graft_merge_b"
  private val SrcStruct = "__graft_merge_s"

  /** Relational MERGE core. Output schema == `base` schema. `source` must
    * carry at least the key columns plus every column referenced via
    * [[src]]; for the default INSERT-all it must carry the full base
    * schema. */
  def merge(base: DataFrame, source: DataFrame, keys: Seq[String],
            matched: Seq[MatchedAction],
            notMatched: Option[NotMatchedInsert],
            sourcePriority: Seq[Column]): DataFrame =
    mergePreDeduped(base, Dedup.firstWins(source, keys, sourcePriority),
      keys, matched, notMatched)

  /** [[merge]] for a source already deduped by key — skips the defensive
    * window pass (callers on hot paths dedup once and reuse the frame). */
  private[graft] def mergePreDeduped(base: DataFrame, batch: DataFrame,
            keys: Seq[String],
            matched: Seq[MatchedAction],
            notMatched: Option[NotMatchedInsert]): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val outCols = base.columns.toSeq

    // null-SAFE key join (<=>): a null-keyed base row must match the
    // null-keyed source partial, or every merge would append a fresh
    // null-key row instead of folding it (rollups over nullable group
    // columns hit this with e.g. anonymous-user groups)
    val bKeys = keys.zipWithIndex.map { case (k, i) => col(k).as(s"__graft_bk$i") }
    val sKeys = keys.zipWithIndex.map { case (k, i) => col(k).as(s"__graft_sk$i") }
    val b = base.select(struct(outCols.map(col): _*).as(BaseStruct) +: bKeys: _*)
    val s = batch.select(struct(batch.columns.map(col).toSeq: _*).as(SrcStruct) +: sKeys: _*)
    val joinCond = keys.indices
      .map(i => col(s"__graft_bk$i") <=> col(s"__graft_sk$i")).reduce(_ && _)
    // shuffle-hash on the batch side: the deduped batch is key-unique, its
    // per-partition hash map is rows/partitions-bounded, and skipping the
    // sort-merge's two per-partition sorts of full-row structs is the
    // larger win (the Cdc.snapshotDiff measurement) — at any scale the
    // batch is the small side of a merge by definition.
    val joined = b.join(s.hint("shuffle_hash"), joinCond, "full_outer")

    val isMatched = col(BaseStruct).isNotNull && col(SrcStruct).isNotNull
    val srcOnly = col(BaseStruct).isNull

    // Clause dispatch: one integer action per row, decided once.
    //   -2 = drop (unmatched source row not inserted, or no-op)
    //   -1 = keep base row   -3 = delete   -4 = insert   i>=0 = update clause i
    val Keep = lit(-1); val Drop = lit(-2); val Delete = lit(-3); val Insert = lit(-4)
    val matchedAction = matched.zipWithIndex.foldRight(Keep) {
      case ((clause, i), rest) =>
        val act = clause match {
          case _: MatchedUpdate => lit(i)
          case _: MatchedDelete => Delete
        }
        clause.condition.fold(act)(c => when(c, act).otherwise(rest))
    }
    val insertAction = notMatched.fold(Drop) { ins =>
      ins.condition.fold(Insert)(c => when(c, Insert).otherwise(Drop))
    }
    val action = when(isMatched, matchedAction)
      .when(srcOnly, insertAction)
      .otherwise(Keep)

    val withAction = joined.withColumn("__graft_merge_action", action)
      .filter(col("__graft_merge_action") =!= Delete &&
              col("__graft_merge_action") =!= Drop)

    val insertValues: Map[String, Column] =
      notMatched.map(_.values).getOrElse(Map.empty)
    val projected = outCols.map { c =>
      val updates = matched.zipWithIndex.collect {
        case (MatchedUpdate(set, _), i) if set.contains(c) =>
          (i, set(c))
      }
      val baseValue = col(s"$BaseStruct.$c") // NOT base(c): the param shadows the helper
      val fromUpdate = updates.foldRight(baseValue) { case ((i, v), rest) =>
        when(col("__graft_merge_action") === i, v).otherwise(rest)
      }
      when(col("__graft_merge_action") === Insert,
           insertValues.getOrElse(c, src(c)))
        .otherwise(fromUpdate).as(c)
    }
    withAction.select(projected: _*)
  }

  /** MERGE into the hash-partitioned parquet layout written by
    * [[Upsert.upsertPartitionedTable]]. Only the buckets containing the
    * batch's keys are read, merged, and swapped; untouched buckets are
    * untouched bytes. The table must already exist in the bucketed layout
    * (create it with `Upsert.upsertPartitionedTable` first).
    *
    * Crash/replay contract (same as the upsert layout): the staging write
    * materializes fully before any bucket swaps, and replaying a batch is
    * safe PROVIDED the clause set is replay-stable — an unconditional
    * NOT-MATCHED INSERT alongside a MATCHED DELETE is not (the replay
    * re-inserts the deleted key, exactly as ANSI MERGE would); guard the
    * insert clause against delete tombstones for idempotent replays. */
  def mergePartitionedTable(spark: SparkSession, path: String, source: DataFrame,
                            keys: Seq[String],
                            matched: Seq[MatchedAction],
                            notMatched: Option[NotMatchedInsert],
                            sourcePriority: Seq[Column]): Unit =
    // single-writer contract, enforced: a concurrent writer fails loudly
    // instead of interleaving bucket swaps (see Upsert.withWriterLock)
    Upsert.withWriterLock(path, spark.sparkContext.hadoopConfiguration) {
      mergePartitionedTableLocked(spark, path, source, keys, matched,
        notMatched, sourcePriority)
    }

  private def mergePartitionedTableLocked(
      spark: SparkSession, path: String, source: DataFrame,
      keys: Seq[String], matched: Seq[MatchedAction],
      notMatched: Option[NotMatchedInsert], sourcePriority: Seq[Column]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val markerBuckets = graft.util.Fs
      .readMarker(s"$path/${Upsert.BucketMarker}", conf).map(_.toInt)
      .getOrElse(throw new IllegalStateException(
        s"$path is not a graft bucketed layout (missing ${Upsert.BucketMarker})"))

    // dedup ONCE (mergePreDeduped skips the second defensive window pass)
    // and persist: the batch feeds the touched-bucket collect AND the merge
    val batch = Dedup.firstWins(source, keys, sourcePriority)
      .withColumn(Upsert.BucketCol,
        pmod(hash(keys.map(col): _*), lit(markerBuckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = batch.select(Upsert.BucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (touched.isEmpty) return

      val baseTouched = spark.read.parquet(path)
        .filter(col(Upsert.BucketCol).isin(touched: _*)) // partition-pruned
        .drop(Upsert.BucketCol)
      val merged = mergePreDeduped(baseTouched, batch.drop(Upsert.BucketCol),
          keys, matched, notMatched)
        .withColumn(Upsert.BucketCol,
          pmod(hash(keys.map(col): _*), lit(markerBuckets)))

      // stage fully, then swap each touched bucket dir (same crash contract
      // as upsertPartitionedTable: idempotent re-run heals a partial swap)
      val tmp = path + ".__graft_tmp"
      merged.write.mode(SaveMode.Overwrite).partitionBy(Upsert.BucketCol).parquet(tmp)
      touched.foreach { bkt =>
        val dir = s"${Upsert.BucketCol}=$bkt"
        if (graft.util.Fs.exists(s"$tmp/$dir", conf))
          graft.util.Fs.swapInto(s"$tmp/$dir", s"$path/$dir", conf)
        else // every row of the bucket was deleted
          graft.util.Fs.deleteRecursively(s"$path/$dir", conf)
      }
      graft.util.Fs.deleteRecursively(tmp, conf)
    } finally batch.unpersist()
  }
}
