package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Operational-maintenance surface: small-file compaction on the bucketed
  * layout and index-store vacuum. */
class MaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fileCount(dir: String): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(conf).listStatus(p)
      .count(s => s.isFile && !s.getPath.getName.startsWith("_"))
  }

  test("compactBuckets rewrites only oversized buckets, data unchanged") {
    val path = tempDir("compact") + "/t"
    val rows = (1L to 400L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, rows, Seq("k"), Seq(col("k")), numBuckets = 2)
    // accumulate additional files per bucket (AQE coalesces the upsert's
    // tiny shuffles to one file, so append a second generation directly —
    // the multi-file shape incremental merges produce at real scale)
    (401L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
      .withColumn(Upsert.BucketCol,
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(col("k")),
          org.apache.spark.sql.functions.lit(2)))
      .coalesce(1)
      .write.mode("append").partitionBy(Upsert.BucketCol).parquet(path)

    val conf = spark.sparkContext.hadoopConfiguration
    val buckets = graft.util.Fs.childDirsWithPrefix(path, Upsert.BucketCol + "=", conf)
    assert(buckets.exists(b => fileCount(s"$path/$b") > 1),
      "setup should produce multi-file buckets")

    val before = Upsert.readPartitionedTable(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = Layout.compactBuckets(spark, path, maxFilesPerBucket = 1)
    assert(n > 0)
    buckets.foreach(b => assert(fileCount(s"$path/$b") === 1))
    val after = Upsert.readPartitionedTable(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === before)

    // already compact → no-op
    assert(Layout.compactBuckets(spark, path, maxFilesPerBucket = 1) === 0)
  }

  test("compactBuckets heals a crash between bucket delete and staged rename") {
    val path = tempDir("compact-heal") + "/t"
    val rows = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, rows, Seq("k"), Seq(col("k")), numBuckets = 2)
    val conf = spark.sparkContext.hadoopConfiguration
    val bucket = graft.util.Fs
      .childDirsWithPrefix(path, Upsert.BucketCol + "=", conf).head

    // simulate the crash window: bucket content staged, bucket dir deleted,
    // rename never happened
    val fs = graft.util.Fs.fileSystem(path, conf)
    val staged = new org.apache.hadoop.fs.Path(s"$path/.__graft_compact_$bucket")
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/$bucket"), staged))

    // next maintenance run completes the swap before compacting
    Layout.compactBuckets(spark, path, maxFilesPerBucket = 1)
    val back = Upsert.readPartitionedTable(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back === (1L to 100L).map(i => i -> s"v$i").toMap)
    assert(!graft.util.Fs.exists(staged.toString, conf))
  }

  test("IndexStore.vacuum reclaims superseded index generations") {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = tempDir("vacuum-src") + "/emb"
    (1L to 50L).map(i => (i, Array.fill(4)(i.toFloat))).toDF("vec_id", "embedding")
      .write.parquet(src)

    val p1 = Similarity.IndexStore.pathFor(spark, src, "ix")
    graft.util.Fs.writeMarker(s"$p1/_SUCCESS", "", conf) // fake generation 1

    Thread.sleep(1100) // mtime resolution: ensure the rewrite changes the fingerprint
    (1L to 50L).map(i => (i, Array.fill(4)(-i.toFloat))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(src)
    val p2 = Similarity.IndexStore.pathFor(spark, src, "ix")
    assert(p1 !== p2, "rewrite must change the fingerprinted path")
    graft.util.Fs.writeMarker(s"$p2/_SUCCESS", "", conf) // generation 2

    val reclaimed = Similarity.IndexStore.vacuum(spark, Seq(src))
    assert(reclaimed >= 1)
    assert(!graft.util.Fs.exists(p1, conf), "stale generation must be gone")
    assert(graft.util.Fs.exists(p2, conf), "live generation must survive")
  }
}
