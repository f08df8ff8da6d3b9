package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked range join: same-key row pairs within a time window.
  *
  * A naive per-key self-join produces |rows-per-key|² candidates before the
  * range filter (66M at sf0.1 for the events table); blocking on a
  * time-bucket equality keeps it a hash join over bucket-sized groups.
  *
  * Blocking is TWO-SIDED so pairs straddling a bucket boundary are found:
  * the left side is exploded into its own bucket AND the next one (the only
  * two buckets a within-`window` right row can live in, provided
  * `window <= bucket width`), while the right side keeps its single true
  * bucket. Join on bucket equality therefore yields each qualifying pair
  * EXACTLY once — the two left copies carry distinct bucket keys, and a
  * right row has one — so no post-join dedup is needed.
  *
  * Scale shape: one shuffle on (key, bucket); the left side doubles in rows
  * (explode of 2), which is the price of boundary correctness and far
  * cheaper than a union-then-distinct over the pair set.
  */
object RangeJoin {

  /** Pairs (a, b) with equal `keyCols`, `b.ts ∈ (a.ts, a.ts + window]`.
    * `window` must not exceed one hour (the bucket width). Output: the
    * `select`-ed columns from each side, prefixed by the caller. */
  def withinWindowPairs(df: DataFrame, keyCols: Seq[String], tsCol: String,
                        window: Column, outA: Seq[(String, String)],
                        outB: Seq[(String, String)]): DataFrame = {
    val hour = date_trunc("hour", col(tsCol))
    val a = df.withColumn("__block",
      explode(array(hour, hour + expr("INTERVAL 1 HOUR")))).as("a")
    val b = df.withColumn("__block", hour).as("b")
    val joinCond = keyCols.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) &&
      col("a.__block") === col("b.__block") &&
      col(s"b.$tsCol") > col(s"a.$tsCol") &&
      col(s"b.$tsCol") <= col(s"a.$tsCol") + window
    a.join(b, joinCond)
      .select(outA.map { case (c, n) => col(s"a.$c").as(n) } ++
        outB.map { case (c, n) => col(s"b.$c").as(n) }: _*)
  }
}
