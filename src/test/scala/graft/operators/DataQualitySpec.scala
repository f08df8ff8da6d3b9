package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DataQualitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("one-pass expectations report per-rule violations") {
    val df = Seq(
      (1L, Some("a"), 10.0),
      (2L, None, -5.0),
      (2L, Some("c"), 7.0)).toDF("k", "name", "v")
    val report = DataQuality.check(df, Seq(
      DataQuality.expectNonEmpty,
      DataQuality.expectNoNulls("name"),
      DataQuality.expectUnique("k"),
      DataQuality.expectAll("v non-negative", col("v") >= 0)))
    assert(!report.passed)
    val byName = report.results.map(r => r.name -> r.violations).toMap
    assert(byName("non_empty") === 0)
    assert(byName("no_nulls(name)") === 1)
    assert(byName("unique(k)") === 1)
    assert(byName("v non-negative") === 1)
  }

  test("clean frame passes; empty frame fails non_empty") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    assert(DataQuality.check(clean, Seq(
      DataQuality.expectNonEmpty, DataQuality.expectUnique("k"))).passed)
    val empty = clean.filter(lit(false))
    val r = DataQuality.check(empty, Seq(DataQuality.expectNonEmpty))
    assert(!r.passed)
  }

  test("orphanCount finds referential violations") {
    val child = Seq((1L, "x"), (99L, "y")).toDF("fk", "v")
    val parent = Seq((1L, "p")).toDF("pk", "p")
    assert(DataQuality.orphanCount(child, parent, "fk", "pk") === 1)
  }

  test("streaming foreachBatch upsert: idempotent keyed load") {
    val dir = tempDir("stream-upsert")
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    events.write.mode("overwrite").parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val n = events.count()

    def runOnce(ckpt: String): Unit = {
      val q = graft.streaming.EventStreams.upsertStream(
        spark.readStream.schema(schema).parquet(s"$dir/in"),
        s"$dir/table", s"$dir/$ckpt", keys = Seq("event_id"))
      q.awaitTermination(120000)
      ()
    }
    runOnce("ckpt1")
    assert(Upsert.readPartitionedTable(spark, s"$dir/table").count() === n)
    // full REPROCESSING (fresh checkpoint): same keys → same state
    runOnce("ckpt2")
    assert(Upsert.readPartitionedTable(spark, s"$dir/table").count() === n)
  }

  test("zscore outlier summary: flags only >z-sigma rows, skips degenerate groups") {
    // group "a": 10 values at 100 ± small noise, one wild 1000 → one outlier.
    // group "b": constant (sd = 0) → never flagged. group "c": single row
    // (stddev_samp null) → never flagged.
    val a = (1 to 10).map(i => ("a", 100.0 + (i % 3))) :+ (("a", 1000.0))
    val rows = a ++ Seq(("b", 5.0), ("b", 5.0), ("c", 42.0))
    val out = DataQuality.zscoreOutlierSummary(
      rows.toDF("g", "value"), "g", "value", z = 3.0).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "a" && r.getLong(1) === 1L)
    assert(r.getDouble(2) > 3.0) // the 1000.0 row's z-score
  }
}
