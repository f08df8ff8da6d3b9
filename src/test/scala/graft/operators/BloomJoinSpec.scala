package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BloomJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def probe = (1L to 10000L).map(i => (i, s"p$i")).toDF("k", "pv")
  private def build = (1L to 10000L by 100).map(i => (i, s"b$i")).toDF("k", "bv")

  test("prunedJoin result equals the plain join exactly") {
    val plain = probe.join(build, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val pruned = BloomJoin.prunedJoin(probe, build, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(pruned === plain)
    assert(pruned.size === 100)
  }

  test("bloom predicate prunes most non-matching probe rows pre-join") {
    val bloom = BloomJoin.keyBloom(build, Seq("k"), expectedItems = 100)
    val kept = probe.filter(BloomJoin.mightContain(spark, bloom, Seq(col("k")))).count()
    // 100 true keys + ~1% fpp of the other 9900 — far below the full 10000
    assert(kept >= 100)
    assert(kept < 500, s"bloom kept $kept of 10000 — not pruning")
  }

  test("multi-column keys hash consistently on both sides") {
    val p2 = (1L to 1000L).map(i => (i % 50, i % 20, i)).toDF("a", "b", "x")
    val b2 = Seq((1L, 1L, "m"), (2L, 2L, "n")).toDF("a", "b", "y")
    val plain = p2.join(b2, Seq("a", "b")).agg(count(lit(1))).head().getLong(0)
    val pruned = BloomJoin.prunedJoin(p2, b2, Seq("a", "b"))
      .agg(count(lit(1))).head().getLong(0)
    assert(pruned === plain)
    assert(plain > 0)
  }

  test("joinable-but-different key types widen before hashing — no dropped rows") {
    // int probe vs bigint build: xxhash64 is type-sensitive, so without
    // widening the bloom would yield false NEGATIVES and silently drop
    // every matching row (a plain equi-join coerces and matches them)
    val pInt = (1 to 1000).map(i => (i, s"p$i")).toDF("k", "pv")
    val bLong = (1L to 1000L by 10).map(i => (i, s"b$i")).toDF("k", "bv")
    val plain = pInt.join(bLong, Seq("k")).count()
    val pruned = BloomJoin.prunedJoin(pInt, bLong, Seq("k")).count()
    assert(plain === 100)
    assert(pruned === plain, "bloom with mismatched key types dropped rows")
  }

  test("un-widenable key types fail loudly instead of silently pruning everything") {
    val pStr = Seq(("1", "x")).toDF("k", "pv")
    val bBin = Seq((Array[Byte](1), "y")).toDF("k", "bv")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(pStr, bBin, Seq("k"))
    }
    assert(e.getMessage.contains("un-widenable"))
  }

  test("a bloom exceeding the session caps fails loudly instead of degrading") {
    val e = intercept[IllegalArgumentException] {
      BloomJoin.keyBloom(build, Seq("k"), expectedItems = 50000000L)
    }
    assert(e.getMessage.contains("maxNumItems"))
  }

  test("the bloom filter sits below the join in the physical plan") {
    // parquet-backed probe: ConvertToLocalRelation would eagerly evaluate
    // the filter over an in-memory relation and hide it from the plan
    val dir = tempDir("bloom-plan")
    probe.write.parquet(s"$dir/probe")
    val probeP = spark.read.parquet(s"$dir/probe")
    val out = BloomJoin.prunedJoin(probeP, build, Seq("k"), expectedItems = Some(100))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected bloom predicate in plan:\n$plan")
    // predicate must be on the probe side scan, i.e. appear in a Filter
    // node, not re-evaluated post-join
    assert(plan.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("might_contain")))
  }
}
