package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on by default in Spark 4) splits oversized
  * shuffle partitions at runtime and is the first tool to reach for; salting
  * is the explicit fallback when a single JOIN KEY is hot enough that even a
  * split partition re-concentrates on one reducer (AQE can't split one key),
  * or when AQE is unavailable (e.g. inside a cached exchange).
  *
  * Left rows spread across `saltBuckets` sub-keys via a deterministic hash of
  * the whole row (no `rand()` — task retries must land rows in the same
  * bucket or the join duplicates/drops rows); the right side replicates
  * `saltBuckets`×. Right-side replication cost means this fits the
  * big-skewed-fact ⋈ small-dim shape — for the huge-⋈-huge case, salt only
  * the hot keys (split-union) instead. */
object SkewJoin {

  /** Join types where right-side replication cannot duplicate output rows:
    * unmatched right rows never surface. Right/full outer joins would emit
    * each unmatched right row once PER SALT REPLICA — rejected. */
  private val saltSafeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(saltSafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"joinType '$joinType' is not salt-safe: replicated right rows would " +
        "duplicate unmatched right-side output (use inner/left/semi/anti)")
    val saltedLeft = left.withColumn("__graft_salt",
      pmod(hash(left.columns.map(col): _*), lit(saltBuckets)))
    val saltedRight = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(saltedRight, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }
}
