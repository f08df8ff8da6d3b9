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
