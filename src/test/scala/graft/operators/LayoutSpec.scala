package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Layout.writeBucketed(li, "li_b", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
    Layout.writeBucketed(o, "o_b", "o_orderkey", 8, sortCols = Seq("o_orderkey"))

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"o_totalprice", $"l_quantity")
    assert(Layout.isShuffleFree(joined), joined.queryExecution.executedPlan.toString)

    // same answer as the plain (shuffled) join
    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"o_totalprice", $"l_quantity")
    assert(joined.count() === plain.count())
  }

  test("partitioned upsert touches only affected buckets") {
    val path = tempDir("part-upsert") + "/t"
    val base = spark.range(1000).select($"id".as("k"), lit("v0").as("v"))
    Upsert.upsertPartitionedTable(spark, path, base, Seq("k"), Seq(col("k")), numBuckets = 8)
    assert(Upsert.readPartitionedTable(spark, path).count() === 1000)

    // record per-partition file listings
    def files(): Map[String, Set[String]] =
      new java.io.File(path).listFiles().filter(_.getName.startsWith(Upsert.BucketCol))
        .map(d => d.getName -> d.listFiles().map(f => f.getName + ":" + f.lastModified()).toSet)
        .toMap
    val before = files()

    // one-key update: exactly one bucket rewritten
    val upd = Seq((7L, "V7")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, upd, Seq("k"), Seq(col("k")), numBuckets = 8)
    val after = files()

    val out = Upsert.readPartitionedTable(spark, path)
    assert(out.count() === 1000)
    assert(out.filter($"k" === 7L).select("v").head().getString(0) === "V7")
    assert(out.filter($"k" === 8L).select("v").head().getString(0) === "v0")

    val changed = before.keys.filter(k => before(k) != after(k))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")
  }

  test("partitioned upsert: bucket-count change triggers safe re-bucket migration") {
    val path = tempDir("part-rebucket") + "/t"
    val base = spark.range(100).select($"id".as("k"), lit("v0").as("v"))
    Upsert.upsertPartitionedTable(spark, path, base, Seq("k"), Seq(col("k")), numBuckets = 8)
    // same key updated under a DIFFERENT modulus: without migration the old
    // row would survive in an untouched bucket → duplicate key
    val upd = Seq((7L, "V7")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, upd, Seq("k"), Seq(col("k")), numBuckets = 4)
    val out = Upsert.readPartitionedTable(spark, path)
    assert(out.count() === 100)
    assert(out.filter($"k" === 7L).collect().map(_.getString(1)).toSeq === Seq("V7"))
    // layout is now 4 buckets
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith(Upsert.BucketCol)) <= 4)
  }

  test("partitioned upsert works against a scheme-qualified (file://) URI") {
    // the storage layer must resolve the filesystem from the path scheme
    // (Hadoop FileSystem API), not assume java.io.File — this is the 100 TB
    // deployment shape (hdfs:// / s3a://), exercised here via file://
    val path = "file://" + tempDir("part-upsert-uri") + "/t"
    val base = spark.range(100).select($"id".as("k"), lit("v0").as("v"))
    Upsert.upsertPartitionedTable(spark, path, base, Seq("k"), Seq(col("k")), numBuckets = 4)
    assert(Upsert.readPartitionedTable(spark, path).count() === 100)

    // incremental merge on the URI path must take the anti-join branch, not
    // silently re-create: the updated key must not be duplicated
    val upd = Seq((7L, "V7")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, upd, Seq("k"), Seq(col("k")), numBuckets = 4)
    val out = Upsert.readPartitionedTable(spark, path)
    assert(out.count() === 100)
    assert(out.filter($"k" === 7L).collect().map(_.getString(1)).toSeq === Seq("V7"))
  }

  test("flat upsertTable works against a scheme-qualified (file://) URI") {
    val path = "file://" + tempDir("flat-upsert-uri") + "/t"
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Upsert.upsertTable(spark, path, b1, Seq("k"), Seq(col("k")))
    val b2 = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    Upsert.upsertTable(spark, path, b2, Seq("k"), Seq(col("k")))
    val out = spark.read.parquet(path).orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("partitioned upsert: new keys create their buckets, re-run idempotent") {
    val path = tempDir("part-upsert2") + "/t"
    val b1 = Seq((1L, "a")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, b1, Seq("k"), Seq(col("k")), numBuckets = 4)
    Upsert.upsertPartitionedTable(spark, path, b1, Seq("k"), Seq(col("k")), numBuckets = 4)
    assert(Upsert.readPartitionedTable(spark, path).count() === 1)
    val b2 = Seq((2L, "b"), (3L, "c")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, b2, Seq("k"), Seq(col("k")), numBuckets = 4)
    assert(Upsert.readPartitionedTable(spark, path).count() === 3)
  }
}
