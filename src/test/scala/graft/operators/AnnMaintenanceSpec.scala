package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Incremental ANN index maintenance: appends fold into the persisted
  * index without a full rebuild, touch only their target cells, replay
  * idempotently, and retrain only past the drift threshold. */
class AnnMaintenanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select($"vec_id", $"embedding")

  /** (relative path → mtime) of every data file under dir. */
  private def fileState(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) Map.empty
    else {
      val s = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toMap
      } finally s.close()
    }
  }

  test("IVF append: new vectors served without rebuild, untouched cells byte-stable") {
    val path = tempDir("ivf-maint") + "/idx"
    val base = emb.filter($"vec_id" < 450)
    val ivf = Similarity.Ivf(nCentroids = 8, nProbe = 3)
    val (centers0, _) = ivf.maintain(spark, base, base.limit(0), path)
    val centersState0 = fileState(s"$path/centers")
    val indexState0 = fileState(s"$path/index")
    val (b0, a0) = Similarity.IndexStore.readMeta(spark, path)
    assert(b0 === 450 && a0 === 0)

    // append the remaining ~10%
    val batch = emb.filter($"vec_id" >= 450)
    val (centers1, index1) = ivf.maintain(spark, emb, batch, path)
    assert(centers1.map(_.toSeq).toSeq === centers0.map(_.toSeq).toSeq) // no retrain
    assert(fileState(s"$path/centers") === centersState0)              // centers untouched
    assert(index1.count() === 500)                                     // all rows served
    val (b1, a1) = Similarity.IndexStore.readMeta(spark, path)
    assert(b1 === 450 && a1 === 50)

    // untouched cells kept their exact files; touched cells only GAINED
    val indexState1 = fileState(s"$path/index")
    indexState0.foreach { case (f, mtime) =>
      assert(indexState1.get(f).contains(mtime), s"pre-existing file $f changed")
    }
    assert(indexState1.keySet.diff(indexState0.keySet).nonEmpty)

    // a clustered append (3 near-copies of one vector) touches ONLY that
    // vector's cell: every other cell directory gains no files
    val v5 = emb.filter($"vec_id" === 5).select($"embedding")
      .head().getSeq[Float](0).toArray
    val clustered = (1 to 3).map(p => (8000L + p, v5.map(x => x * (1.0f + 0.001f * p))))
      .toDF("vec_id", "embedding")
    assert(ivf.append(spark, clustered, path) === 3L)
    val indexState2 = fileState(s"$path/index")
    val touchedCells = indexState2.keySet.diff(indexState1.keySet)
      .map(_.split("/").head)
    assert(touchedCells.size === 1,
      s"clustered append should touch one cell, got $touchedCells")

    // an appended vector is retrievable through the probed cells
    val newId = 460L
    val qv = emb.filter($"vec_id" === newId)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val q = emb.filter($"vec_id" === newId).select($"embedding".as("qv"))
    val top = ivf.topK(centers1, index1, q, k = 3).collect().map(_.getLong(0))
    assert(top.contains(newId), s"appended vector $newId not served, got ${top.toSeq}")

    // replaying the same batch appends nothing (ids already in their cells)
    assert(ivf.append(spark, batch, path) === 0L)
    assert(index1.count() === 500)
  }

  test("IVF maintain: drift past the threshold triggers a full retrain") {
    val path = tempDir("ivf-drift") + "/idx"
    val base = emb.filter($"vec_id" < 100)
    val ivf = Similarity.Ivf(nCentroids = 4, nProbe = 2)
    ivf.maintain(spark, base, base.limit(0), path)
    val centersState0 = fileState(s"$path/centers")

    // a batch >50% of base: retrain instead of appending into stale cells
    val batch = emb.filter($"vec_id" >= 100 && $"vec_id" < 200)
    val (_, index) = ivf.maintain(spark, emb.filter($"vec_id" < 200), batch, path,
      driftThreshold = 0.5)
    assert(index.count() === 200)
    assert(fileState(s"$path/centers") !== centersState0, "expected a retrain")
    val (b, a) = Similarity.IndexStore.readMeta(spark, path)
    assert(b === 200 && a === 0) // accounting reset by the rebuild
  }

  test("SignLSH append: deterministic cells, pruned probe finds appended vectors") {
    val path = tempDir("lsh-maint") + "/idx"
    val lsh = Similarity.SignLsh(nBits = 8, dim = 64)
    val base = emb.filter($"vec_id" < 450)
    lsh.loadOrBuild(spark, base, path): Unit
    val state0 = fileState(path)

    val batch = emb.filter($"vec_id" >= 450)
    assert(lsh.append(spark, batch, path) === 50L)
    val state1 = fileState(path)
    state0.foreach { case (f, mtime) =>
      assert(state1.get(f).contains(mtime), s"pre-existing file $f changed")
    }

    // appended rows live in the same cells a full rebuild would choose
    val rebuilt = lsh.index(emb).select($"vec_id", $"bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val served = spark.read.parquet(path).select($"vec_id", $"bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(served === rebuilt)

    // a probe for an appended vector finds it through the pruned scan
    val newId = 470L
    val qv = emb.filter($"vec_id" === newId)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val top = lsh.topKPruned(spark.read.parquet(path), qv, k = 3)
      .collect().map(_.getLong(0))
    assert(top.contains(newId))

    // replay: no duplicates
    assert(lsh.append(spark, batch, path) === 0L)
    assert(spark.read.parquet(path).count() === 500)
  }

  test("compact: appended small files collapse to one per cell, contents identical") {
    val path = tempDir("lsh-compact") + "/idx"
    val lsh = Similarity.SignLsh(nBits = 8, dim = 64)
    lsh.loadOrBuild(spark, emb.filter($"vec_id" < 400), path): Unit
    // three append batches → up to three extra files per touched group
    Seq(400L -> 430L, 430L -> 470L, 470L -> 500L).foreach { case (lo, hi) =>
      lsh.append(spark, emb.filter($"vec_id" >= lo && $"vec_id" < hi), path): Unit
    }
    val before = spark.read.parquet(path)
      .select($"vec_id", $"bucket", $"bucket_grp")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val filesBefore = fileState(path).size

    lsh.compact(spark, path)

    val after = spark.read.parquet(path)
      .select($"vec_id", $"bucket", $"bucket_grp")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(after === before)
    val groups = spark.read.parquet(path).select($"bucket_grp").distinct().count()
    val filesAfter = fileState(path).size
    assert(filesAfter === groups.toInt, s"expected one file per group, got $filesAfter/$groups")
    assert(filesAfter < filesBefore)
    // a probe still works through the compacted layout
    val qv = emb.filter($"vec_id" === 480).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray
    assert(lsh.topKPruned(spark.read.parquet(path), qv, k = 3)
      .collect().map(_.getLong(0)).contains(480L))
  }
}
