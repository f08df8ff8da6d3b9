package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("packChunked: documents chunk into capacity windows by start offset") {
    val docs = Seq((1L, "g", 600), (2L, "g", 600), (3L, "g", 600), (4L, "g", 600))
      .toDF("id", "grp", "n")
    val out = Packing.packChunked(docs, col("id"), col("n"), capacity = 1000,
        group = Seq(col("grp")))
      .select("id", "pack_id", "begin_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // stream offsets: 0, 600, 1200, 1800 → packs 0,0,1,1
    assert(out === Set((1L, 0L, 0L), (2L, 0L, 600L), (3L, 1L, 200L), (4L, 1L, 800L)))
  }

  test("packChunked: groups pack independently") {
    val docs = Seq((1L, "a", 900), (2L, "b", 900), (3L, "a", 900), (4L, "b", 300))
      .toDF("id", "grp", "n")
    val out = Packing.packChunked(docs, col("id"), col("n"), 1000, Seq(col("grp")))
      .select("grp", "id", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("a", 1L, 0L), ("a", 3L, 0L), ("b", 2L, 0L), ("b", 4L, 0L)))
  }

  test("packNextFit: no pack exceeds capacity; oversize doc gets its own pack") {
    val docs = Seq(
      (1L, "g", 700L), (2L, "g", 500L), (3L, "g", 400L),
      (4L, "g", 300L), (5L, "g", 1500L) // oversize
    ).toDF("id", "grp", "n")
    val out = Packing.packNextFit(docs, "id", "n", capacity = 1000, groupCols = Seq("grp"))
      .select("id", "n", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPack = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    // every pack either fits, or is a single oversize document
    byPack.foreach { case (pid, total) =>
      val members = out.filter(_._3 == pid)
      assert(total <= 1000 || members.length === 1,
        s"pack $pid holds $total tokens across ${members.length} docs")
    }
    // determinism
    val again = Packing.packNextFit(docs, "id", "n", 1000, Seq("grp"))
      .select("id", "n", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === again.toSet)
  }

  test("packNextFit: next-fit-decreasing yields the expected packs") {
    // sorted desc: 700, 500, 400, 300 with capacity 1000:
    // pack0: 700 (+500 overflows) → pack1: 500+400 (+300 overflows) → pack2: 300
    val docs = Seq((1L, "g", 700L), (2L, "g", 500L), (3L, "g", 400L), (4L, "g", 300L))
      .toDF("id", "grp", "n")
    val out = Packing.packNextFit(docs, "id", "n", 1000, Seq("grp"))
      .select("id", "pack_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("packNextFitParallel: one 10M-token group packs distributed at >=95% efficiency") {
    // single group, ~100k docs, ~10M tokens: the sequential discipline
    // serializes this into ONE task; the parallel form must spread it and
    // stay within 5% of the sequential pack count
    val n = 100000
    val docs = spark.range(n.toLong).select(
      col("id"),
      lit("g").as("grp"),
      (pmod(xxhash64(col("id")), lit(200L)) + 1).cast("int").as("n"))
    val capacity = 2048

    val seqPacks = Packing.packNextFit(docs, "id", "n", capacity, Seq("grp"))
      .select("pack_id").distinct().count()
    val par = Packing.packNextFitParallel(docs, "id", "n", capacity, Seq("grp"),
      parallelism = 32)

    // integrity: every doc packed exactly once, no pack over capacity
    assert(par.count() === n.toLong)
    val overfull = par.groupBy("pack_id").agg(sum("n").as("fill"))
      .filter(col("fill") > capacity).count()
    assert(overfull === 0)

    // distribution: the pack stage runs over MANY non-empty partitions, not
    // one giant sequential task. (AQE rightly coalesces these few MB into
    // one partition — disable coalescing to observe the scale shape, where
    // bins are big enough that AQE keeps them apart.)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey, "true")
    val busy =
      try {
        spark.conf.set(coalesceKey, "false")
        val arranged = docs
          .withColumn("__graft_sub", pmod(xxhash64(col("id")), lit(32L)).cast("int"))
          .repartition(col("grp"), col("__graft_sub"))
        arranged.rdd.mapPartitions(it => Iterator(if (it.hasNext) 1 else 0)).sum().toInt
      } finally spark.conf.set(coalesceKey, saved)
    assert(busy > 1, s"expected multiple busy partitions, got $busy")

    // fill efficiency: within 5% of the sequential pack count
    val parPacks = par.select("pack_id").distinct().count()
    info(s"sequential packs: $seqPacks, parallel packs: $parPacks")
    assert(parPacks.toDouble <= seqPacks.toDouble * 1.05,
      s"parallel packing wasted too many packs: $parPacks vs $seqPacks")

    // determinism: same input -> identical assignment
    val again = Packing.packNextFitParallel(docs, "id", "n", capacity, Seq("grp"),
      parallelism = 32)
    assert(par.select("id", "pack_id").except(again.select("id", "pack_id")).count() === 0)
  }
}
