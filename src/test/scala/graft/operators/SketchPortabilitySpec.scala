package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Specs for the round-17 PORTABLE sketches (q42/q107/q109's move from
  * rows-only to hash-green): the portable HLL's registers/estimator and
  * the BottomK (KMV) sample aggregate. Cross-engine parity itself is
  * proven by the DuckDB oracles; these pin the in-engine properties the
  * oracles assume. */
class SketchPortabilitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  import SketchRollup.PortableHll

  test("portable HLL estimates within the m=4096 error envelope") {
    val df = spark.range(50000).select(col("id"))
    val est = PortableHll.estimate(
      PortableHll.registers(df, Nil, col("id")), Nil)
      .head().getAs[Double]("approx_distinct")
    // 1.04/sqrt(4096) ~ 1.6% standard error; 5% is > 3 sigma
    assert(math.abs(est - 50000) / 50000.0 < 0.05, s"estimate $est")
  }

  test("portable HLL register max-merge equals direct registers (union law)") {
    val a = spark.range(0, 30000).select(col("id"))
    val b = spark.range(20000, 60000).select(col("id")) // overlapping
    val direct = PortableHll.registers(a.union(b), Nil, col("id"))
    val merged = PortableHll.registers(a, Nil, col("id"))
      .union(PortableHll.registers(b, Nil, col("id")))
      .groupBy("hb").agg(max("hm").as("hm"))
    assert(direct.except(merged).count() === 0)
    assert(merged.except(direct).count() === 0)
    // and therefore identical estimates
    val e1 = PortableHll.estimate(direct, Nil).head().getDouble(0)
    val e2 = PortableHll.estimate(merged, Nil).head().getDouble(0)
    assert(e1 === e2)
  }

  test("registersWithRowCount: same registers, and sum(bn) == count(*) per group") {
    // the q107 single-pass fusion (round-19.2): one aggregation yields
    // BOTH the register lattice and exact per-group row counts
    val df = spark.range(40000)
      .select(col("id"), (col("id") % 3).cast("string").as("g"))
    val fused = PortableHll.registersWithRowCount(
      df, Seq("g" -> col("g")), col("id"))
    val plain = PortableHll.registers(df, Seq("g" -> col("g")), col("id"))
    val fusedRegs = fused.select("g", "hb", "hm")
    assert(fusedRegs.except(plain).count() === 0)
    assert(plain.except(fusedRegs).count() === 0)
    val counts = fused.groupBy("g").agg(sum("bn").as("n")).as[(String, Long)]
      .collect().toMap
    val direct = df.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts === direct)
  }

  test("portable HLL is duplicate-insensitive") {
    val once = spark.range(10000).select(col("id"))
    val thrice = once.union(once).union(once)
    val e1 = PortableHll.estimate(PortableHll.registers(once, Nil, col("id")), Nil)
      .head().getDouble(0)
    val e3 = PortableHll.estimate(PortableHll.registers(thrice, Nil, col("id")), Nil)
      .head().getDouble(0)
    assert(e1 === e3)
  }

  test("graft_bottomk keeps exactly the k smallest (hash, value) pairs, value-sorted") {
    graft.plans.Hash60.register(spark)
    graft.plans.BottomK.register(spark)
    val n = 5000
    val df = spark.range(n)
      .select(col("id"), (col("id") % 977).cast("double").as("v"))
      .repartition(8) // exercise partial buffers + merge
    val got = df.agg(graft.plans.BottomK.of(
        call_function("graft_hash60", col("id").cast("string")),
        col("v"), 100).as("s"))
      .head().getSeq[Double](0)
    // brute-force reference: same hash, same pair order
    val expected = (0L until n)
      .map(i => (graft.plans.Hash60.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)),
        (i % 977).toDouble))
      .sorted.take(100).map(_._2).sorted
    assert(got === expected)
  }

  test("graft_bottomk with k >= group size collects everything") {
    graft.plans.Hash60.register(spark)
    graft.plans.BottomK.register(spark)
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 3.0)).toDF("id", "v")
    val got = df.agg(graft.plans.BottomK.of(
        call_function("graft_hash60", col("id").cast("string")),
        col("v"), 10).as("s"))
      .head().getSeq[Double](0)
    assert(got === Seq(1.0, 3.0, 5.0))
  }
}
