package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class UpsertSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("upsert: updates replace same-key rows, base rows survive") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val out = Upsert.upsert(base, updates, Seq("k"), Seq(col("k"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D"))
  }

  test("upsert: duplicate keys within the batch collapse deterministically") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val updates = Seq((1L, "first"), (1L, "second")).toDF("k", "v")
    val out = Upsert.upsert(base, updates, Seq("k"), Seq(col("v").asc)).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "first")
  }

  test("upsertTable: round-trip create, re-run idempotent, key overwrite") {
    val path = tempDir("upsert") + "/t"
    val first = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Upsert.upsertTable(spark, path, first, Seq("k"), Seq(col("k")))
    assert(spark.read.parquet(path).count() === 2)

    // idempotent re-run
    Upsert.upsertTable(spark, path, first, Seq("k"), Seq(col("k")))
    assert(spark.read.parquet(path).count() === 2)

    // overwrite one key, add one
    val second = Seq((2L, "B2"), (3L, "c")).toDF("k", "v")
    Upsert.upsertTable(spark, path, second, Seq("k"), Seq(col("k")))
    val out = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "B2", 3L -> "c"))
  }

  test("dedup firstWins keeps first in order") {
    val in = Seq((1L, 10, "x"), (1L, 20, "y"), (2L, 5, "z")).toDF("k", "ord", "v")
    val out = Dedup.firstWins(in, Seq("k"), Seq(col("ord").asc)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "x", 2L -> "z"))
  }

  test("dedup exact picks deterministic representative") {
    val in = Seq((1L, 2, "b"), (1L, 1, "a"), (2L, 9, "z")).toDF("k", "ord", "v")
    val out = Dedup.exact(in, Seq("k"), Seq(col("ord"))).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "a", 2L -> "z"))
  }

  test("dedup exact rejects .asc/.desc sort-order args, accepts plain columns") {
    val in = Seq((1L, 2, "b"), (1L, 1, "a")).toDF("k", "ord", "v")
    val eAsc = intercept[IllegalArgumentException] {
      Dedup.exact(in, Seq("k"), Seq(col("ord").asc))
    }
    assert(eAsc.getMessage.contains("ascending only"))
    val eDesc = intercept[IllegalArgumentException] {
      Dedup.exact(in, Seq("k"), Seq(col("ord").desc))
    }
    assert(eDesc.getMessage.contains("ascending only"))
    // plain column passes through untouched
    assert(Dedup.exact(in, Seq("k"), Seq(col("ord"))).count() === 1)
  }

  test("writer lock: an in-flight writer makes a second writer FAIL LOUDLY; " +
    "releaseLock recovers a stale lock") {
    val path = tempDir("upsert-lock") + "/t"
    val first = Seq((1L, "a")).toDF("k", "v")
    Upsert.upsertTable(spark, path, first, Seq("k"), Seq(col("k")))
    // simulate an in-flight (or crashed) writer: the lock marker is present
    val conf = spark.sparkContext.hadoopConfiguration
    assert(graft.util.Fs.createExclusive(
      s"$path/${Upsert.LockMarker}", "pid=0 host=test ts=never", conf))
    val e = intercept[IllegalStateException] {
      Upsert.upsertTable(spark, path, Seq((2L, "b")).toDF("k", "v"),
        Seq("k"), Seq(col("k")))
    }
    assert(e.getMessage.contains("concurrent writer"))
    assert(e.getMessage.contains("pid=0")) // names the holder
    // the refused write changed NOTHING
    assert(spark.read.parquet(path).count() === 1)
    // deliberate manual recovery, then the re-run applies cleanly
    Upsert.releaseLock(spark, path)
    Upsert.upsertTable(spark, path, Seq((2L, "b")).toDF("k", "v"),
      Seq("k"), Seq(col("k")))
    assert(spark.read.parquet(path).count() === 2)
  }

  test("writer lock: 8 concurrent partitioned upserts hammer one table — " +
    "every attempt either applies fully or refuses; no interleaved state") {
    val path = tempDir("upsert-hammer") + "/t"
    // seed the layout so every contender takes the incremental branch
    Upsert.upsertPartitionedTable(spark, path,
      Seq((-1L, "seed")).toDF("k", "v"), Seq("k"), Seq(col("k")), numBuckets = 8)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val outcomes = (0 until 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[String, Int]] {
        def call(): Either[String, Int] = {
          val batch = (0 until 10).map(j => (i * 100L + j, s"w$i")).toDF("k", "v")
          barrier.await()
          try { Upsert.upsertPartitionedTable(spark, path, batch, Seq("k"),
              Seq(col("k")), numBuckets = 8); Right(i) }
          catch { case e: IllegalStateException
              if e.getMessage.contains("concurrent writer") => Left(s"refused $i") }
        }
      })
    }
    pool.shutdown()
    val results = outcomes.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    val winners = results.collect { case Right(i) => i }
    assert(winners.nonEmpty, "at least one writer must win the lock")
    assert(results.size === 8) // every attempt resolved to a DEFINED outcome
    // the table holds the seed plus EXACTLY the winners' batches — a torn
    // or interleaved batch would break either the count or the group check
    val rows = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(rows.length === 1 + winners.size * 10)
    winners.foreach { i =>
      assert(rows.count(_._2 == s"w$i") === 10, s"writer $i applied partially")
    }
    // the lock is released after the hammer — a fresh writer proceeds
    Upsert.upsertPartitionedTable(spark, path,
      Seq((-2L, "post")).toDF("k", "v"), Seq("k"), Seq(col("k")), numBuckets = 8)
    assert(spark.read.parquet(path).count() === rows.length + 1)
  }

  test("dedup exact == firstWins whenever the ascending order is total (q06's swap)") {
    // seeded random frame, heavy duplication per key; (ord1, ord2) is made
    // unique per key so the window has no ties and both operators have a
    // single well-defined winner
    val rnd = new scala.util.Random(20260814)
    val rows = (1 to 500).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(50), i, s"v$i")
    }
    val in = rows.toDF("k", "ord1", "ord2", "v")
    val viaAgg = Dedup.exact(in, Seq("k"), Seq(col("ord1"), col("ord2")))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    val viaWindow = Dedup.firstWins(in, Seq("k"), Seq(col("ord1").asc, col("ord2").asc))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(viaAgg === viaWindow)
  }
}
