package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single right
  * row with the greatest `rightTime <= leftTime` for the same key — the
  * time-series join Spark has no built-in operator for.
  *
  * Implementation is the scalable union+window form, not a range join:
  * both sides are tagged and unioned, one window per key ordered by
  * (time, side) carries the latest right payload forward with
  * `last(_, ignoreNulls)`, then left rows are filtered back out. Cost is
  * ONE shuffle of (left+right) by key and an in-partition sort — no
  * quadratic range explosion, no per-row subquery; skewed keys are ordinary
  * window skew (AQE/salting applies). At equal timestamps the right row
  * sorts first, giving the inclusive (`>=`) match DuckDB's ASOF JOIN uses.
  *
  * The right side should be unique per (key, time) — pre-dedup with
  * [[Dedup.firstWins]] — otherwise which same-instant row wins is
  * tie-broken by the union order, not a declared rule. */
object AsOfJoin {

  /** @param rightPayload right-side columns to attach, as (srcName, outName)
    * @param joinType "inner" (drop unmatched left rows) or "left" */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[(String, String)],
               joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"unsupported joinType $joinType")
    val leftCols = left.columns.toSeq
    val payloadOut = rightPayload.map(_._2)

    // The payload travels as ONE struct, not independent columns: filling
    // per-column with last(ignoreNulls) would splice a NULL field of the
    // true as-of match with an older row's value (a row that never
    // existed), and a match whose payload happens to be all-NULL would be
    // indistinguishable from no match. The struct is non-null exactly when
    // a right row exists, regardless of its field values.
    val payloadStruct = struct(rightPayload.map { case (src, out) => col(src).as(out) }: _*)
    val rightAligned0 = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .withColumn("__payload", payloadStruct)
    val rightAligned = leftCols.foldLeft(rightAligned0) {
      case (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ Seq("__payload", "__k", "__t", "__is_left")).map(col): _*)

    val payloadType = rightAligned.schema("__payload").dataType
    val leftAligned = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
      .select((leftCols ++ Seq("__payload", "__k", "__t", "__is_left")).map(col): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = leftAligned.unionByName(rightAligned)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))

    val leftRows = filled.filter(col("__is_left") === 1)
    val matchedFilter =
      if (joinType == "inner") leftRows.filter(col("__payload").isNotNull)
      else leftRows
    matchedFilter.select(
      leftCols.map(col) ++ payloadOut.map(c => col(s"__payload.$c").as(c)): _*)
  }
}
