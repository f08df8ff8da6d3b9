package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity context windows
  * ("packs") for LLM pretraining batches.
  *
  * Two standard disciplines:
  *
  *  - [[packChunked]] — concatenate-and-chunk: documents form one token
  *    stream per group (deterministic id order) that is cut every
  *    `capacity` tokens; a document belongs to the pack where it STARTS
  *    and may straddle the boundary (the usual pretraining layout where
  *    examples are split across windows). Pure window arithmetic: one
  *    shuffle per group column, exact, engine-portable — oracle-checkable.
  *  - [[packNextFit]] — no-split packing: documents sorted by descending
  *    token count fill a pack until the next one would overflow, then a
  *    new pack opens (next-fit-decreasing). Needed when examples must stay
  *    whole (SFT). Inherently sequential per group, so it runs as
  *    per-partition imperative logic — `repartition(group)` +
  *    `sortWithinPartitions` + `mapPartitions` with O(1) state per
  *    partition; each group's packs are independent so the operator scales
  *    with the number of groups, not corpus size.
  *
  * Both are deterministic: same input → same packs, across runs and
  * cluster layouts.
  */
object Packing {

  /** Chunked packing within each `group`: documents in ascending `id`
    * order; `pack_id` = which capacity-window the document starts in,
    * `begin_offset` = its start position within that window. */
  def packChunked(df: DataFrame, id: Column, nTokens: Column, capacity: Int,
                  group: Seq[Column]): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(group: _*).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_cum", sum(nTokens).over(w))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("pack_id",
        floor((col("__graft_cum") - col("n_tokens")) / lit(capacity.toDouble)).cast("long"))
      .withColumn("begin_offset", (col("__graft_cum") - col("n_tokens")) % capacity)
      .drop("__graft_cum")
  }

  /** No-split next-fit-decreasing packing. Output adds `pack_id` (unique
    * within each group) and `pack_fill` (tokens in the pack so far). A
    * document larger than `capacity` gets a pack of its own. The group
    * columns must be string/long-encodable; rows within a group are
    * processed in (tokens desc, id asc) order. */
  def packNextFit(df: DataFrame, idCol: String, nTokensCol: String, capacity: Int,
                  groupCols: Seq[String]): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val projected = df.select(
      (groupCols.map(col) :+ col(idCol) :+ col(nTokensCol).cast("long").as(nTokensCol)): _*)
    val arranged = projected
      .repartition(groupCols.map(col): _*)
      .sortWithinPartitions(
        (groupCols.map(col) :+ col(nTokensCol).desc :+ col(idCol).asc): _*)
    val schema = org.apache.spark.sql.types.StructType(arranged.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("pack_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("pack_fill", org.apache.spark.sql.types.LongType)))
    val nGroup = groupCols.length
    val tokIdx = arranged.schema.fieldIndex(nTokensCol)
    val overflow = capacity.toLong + 1 // fill value that always opens a new pack
    val packed: Dataset[Row] = arranged.mapPartitions { it =>
      // iterator→iterator: O(1) state (current group key, pack id, fill)
      var curKey: Seq[Any] = null
      var packId = -1L
      var fill = overflow
      it.map { row =>
        val key = (0 until nGroup).map(row.get)
        if (key != curKey) { curKey = key; packId = -1L; fill = overflow }
        val n = row.getLong(tokIdx)
        if (fill + n > capacity) { packId += 1; fill = 0L }
        fill += n
        Row.fromSeq(row.toSeq ++ Seq(packId, fill))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    packed.toDF()
  }

  /** [[packNextFit]] with PARALLEL packing inside each group: a
    * deterministic id-hash salt splits every group into `parallelism`
    * independent sub-streams, each packed next-fit-decreasing on its own —
    * so one giant group no longer serializes into one task.
    *
    * Approximation vs the sequential discipline: each sub-stream runs the
    * SAME next-fit-decreasing policy over a uniform random 1/parallelism
    * share of the group, so the overhead is dominated by one trailing
    * underfilled pack per sub-stream — empirically ~`parallelism` extra
    * packs per group (for a 10M-token group at capacity 2048, ~4,900
    * packs, 32-way salting: <1% extra; the spec gates ≥95%). The worst
    * case inherits next-fit-decreasing's approximation factor, exactly as
    * the sequential form does. Pack ids stay unique within the group
    * (sub-stream index in the high bits) but are NOT contiguous;
    * `pack_fill` keeps its per-pack meaning. */
  def packNextFitParallel(df: DataFrame, idCol: String, nTokensCol: String,
                          capacity: Int, groupCols: Seq[String],
                          parallelism: Int = 0): DataFrame = {
    val nSub = if (parallelism > 0) parallelism
               else df.sparkSession.sparkContext.defaultParallelism
    require(nSub < (1 << 20), s"parallelism $nSub would overflow pack-id bits")
    val salted = df.withColumn("__graft_sub",
      pmod(xxhash64(col(idCol)), lit(nSub.toLong)).cast("int"))
    packNextFit(salted, idCol, nTokensCol, capacity, groupCols :+ "__graft_sub")
      .withColumn("pack_id",
        col("__graft_sub").cast("long") * (1L << 40) + col("pack_id"))
      .drop("__graft_sub")
  }
}
