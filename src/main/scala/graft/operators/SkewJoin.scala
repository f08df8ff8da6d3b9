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

  /** Hot-key SPLIT-UNION salted join — the huge-⋈-huge shape.
    *
    * [[saltedJoin]] replicates the ENTIRE right side `saltBuckets`×, which
    * is only affordable against a small dimension. Here the replication is
    * bought per hot key instead: left keys whose row count exceeds
    * `hotThreshold` are salted (and only their right-side rows replicated);
    * every other key takes the plain join. At 100 TB that means the
    * replicated volume is `saltBuckets × (right rows of hot keys)` — a
    * handful of keys — while the bulk of both sides flows through an
    * ordinary shuffle join untouched.
    *
    * Hot-key detection is an EXACT column-pruned count aggregate over the
    * left keys (map-side partial combine: the shuffle carries one row per
    * key per input partition, never the fact table), so the split is
    * deterministic — no sampling noise changing the plan between runs. The
    * hot set is required to be broadcastable by construction: it has at
    * most `|left| / hotThreshold` keys (hard-capped at `maxHotKeys`,
    * failing loudly rather than silently broadcasting an unbounded set).
    *
    * Output equals the plain join row-for-row for every salt-safe join
    * type: the two branches partition the left rows by key, and each
    * branch joins its keys completely. */
  def hotKeySaltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                       hotThreshold: Long, saltBuckets: Int,
                       joinType: String = "inner",
                       maxHotKeys: Int = 100000): DataFrame = {
    require(hotThreshold > 0, "hotThreshold must be positive")
    require(saltSafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"joinType '$joinType' is not salt-safe: replicated right rows would " +
        "duplicate unmatched right-side output (use inner/left/semi/anti)")
    // Detection runs ONCE, eagerly: the hot set is bounded at
    // maxHotKeys+1 rows by the take, so it collects to the driver and
    // re-enters the plan as a broadcast LOCAL relation. (The previous
    // lazily-persisted formulation unpersisted in a finally before the
    // returned DataFrame ever executed, so the detection aggregate was
    // recomputed at action time — once per branch referencing it.)
    val hotRows = left.select(keys.map(col): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__graft_keycnt"))
      .filter(col("__graft_keycnt") > hotThreshold)
      .select(keys.map(col): _*)
      .take(maxHotKeys + 1)
    require(hotRows.length <= maxHotKeys,
      s"more than $maxHotKeys keys exceed hotThreshold=$hotThreshold — " +
        "the hot set would not broadcast; raise the threshold (or salt " +
        "everything with saltedJoin against a small right side)")
    val keySchema = org.apache.spark.sql.types.StructType(
      keys.map(k => left.schema(k)))
    val hotB = broadcast(left.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotRows: _*), keySchema))
    val hotLeft = left.join(hotB, keys, "left_semi")
    val coldLeft = left.join(hotB, keys, "left_anti")
    val hotRight = right.join(hotB, keys, "left_semi")
    // right rows of cold keys still join hot-side rows never — but they
    // must reach the cold branch untouched; the split is on the LEFT key
    // set, and the plain branch keeps the full right side so right rows
    // of hot keys joining cold left rows cannot exist by construction.
    saltedJoin(hotLeft, hotRight, keys, saltBuckets, joinType)
      .unionByName(coldLeft.join(right, keys, joinType))
  }
}
