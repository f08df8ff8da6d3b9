package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit form of Spark's runtime
  * semi-join reduction (`InjectRuntimeFilter`), for when the optimizer
  * cannot prove it profitable but the caller can.
  *
  * Shape: ONE pass over the small/filtered build side produces a bloom
  * sketch (distributed partial aggregation; only the sketch bytes — KBs to
  * a few MB — reach the driver, the standard runtime-filter contract). The
  * sketch is then a foldable literal in a codegen'd `might_contain`
  * predicate on the probe side, evaluated at the scan BEFORE the shuffle:
  * rows that cannot join never get hashed, serialized, or shuffled. The
  * subsequent exact join removes the bloom's false positives, so the result
  * is EXACTLY the plain join — the bloom only changes bytes moved.
  *
  * At 100 TB this is the difference between shuffling the full fact table
  * and shuffling the ~matching fraction: for a 1% selective dim filter, a
  * 1% false-positive bloom cuts probe-side shuffle volume ~50×.
  *
  * Uses Spark's own aggregate/scalar bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair behind
  * `spark.sql.optimizer.runtime.bloomFilter.*`) registered as session
  * functions — codegen'd, no UDF, identical hashing (XxHash64) on both
  * sides.
  */
object BloomJoin {

  /** Register the bloom aggregate + predicate in the session's function
    * registry. Idempotent. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs.head, exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs.head, exprs(1)),
      "built-in")
  }

  /** Build a bloom sketch of `keys` over `build` (one distributed pass).
    * Returns the serialized sketch. `expectedItems` should bound the build
    * side's distinct key count; `fpp` trades sketch size for probe-side
    * shuffle volume. */
  def keyBloom(build: DataFrame, keys: Seq[String],
               expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    register(build.sparkSession)
    // optimal bit count WITHOUT allocating a driver-side filter:
    // n * ln(fpp) / ln(2)^2 (the standard Bloom sizing formula)
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate SILENTLY clamps against the runtime-filter conf
    // limits — a clamped sketch keeps "working" with fpp→1 and prunes
    // nothing. Fail loudly and tell the caller which knob to raise.
    val sqlConf = build.sparkSession.sessionState.conf
    val maxItems = sqlConf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = sqlConf.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom for $expectedItems items / $numBits bits exceeds the session caps " +
        s"($maxItems items / $maxBits bits) and would be silently degraded — raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits, or " +
        "pre-filter the build side")
    build.select(
      call_function("graft_bloom_agg",
        xxhash64(keys.map(col): _*), lit(expectedItems), lit(numBits)))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership predicate against a sketch from [[keyBloom]].
    * The key columns must be listed in the same order as at build time
    * (both sides hash with XxHash64 over the column tuple), and each must
    * have the SAME data type as its build-side counterpart: XxHash64 is
    * type-sensitive (an int and a bigint holding the same value hash
    * differently), so a type mismatch silently yields false NEGATIVES —
    * dropped rows, not just missed pruning. [[prunedJoin]] widens both
    * sides automatically; callers using the raw sketch must align types
    * themselves. */
  def mightContain(spark: SparkSession, bloom: Array[Byte], keys: Seq[Column]): Column = {
    register(spark)
    call_function("graft_bloom_contains", lit(bloom), xxhash64(keys: _*))
  }

  /** Equi-join with probe-side bloom pruning: result == `probe.join(build,
    * usingKeys)` exactly, with the probe side filtered before the shuffle.
    * `expectedItems` defaults to the build side's count (an extra cheap
    * pass); pass it explicitly when known to skip that. */
  def prunedJoin(probe: DataFrame, build: DataFrame, usingKeys: Seq[String],
                 expectedItems: Option[Long] = None, fpp: Double = 0.01): DataFrame = {
    // XxHash64 is type-sensitive: int 5 and bigint 5 hash differently. A
    // plain equi-join would coerce joinable-but-different key types and
    // match them, so hash a WIDENED copy of the keys on both sides (the
    // join below still uses the original columns/types).
    import org.apache.spark.sql.catalyst.analysis.TypeCoercion
    val hashTypes = usingKeys.map { k =>
      val (pt, bt) = (probe.schema(k).dataType, build.schema(k).dataType)
      k -> (if (pt == bt) pt else TypeCoercion.findWiderTypeForTwo(pt, bt).getOrElse(
        throw new IllegalArgumentException(
          s"prunedJoin key '$k' has un-widenable types $pt (probe) vs $bt (build)")))
    }.toMap
    val buildKeys = build.select(usingKeys.map(k => col(k).cast(hashTypes(k)).as(k)): _*)
    val n = expectedItems.getOrElse(buildKeys.distinct().count())
    val bloom = keyBloom(buildKeys, usingKeys, math.max(n, 1L), fpp)
    val pruned = probe.filter(
      mightContain(probe.sparkSession, bloom, usingKeys.map(k => col(k).cast(hashTypes(k)))))
    pruned.join(build, usingKeys)
  }
}
