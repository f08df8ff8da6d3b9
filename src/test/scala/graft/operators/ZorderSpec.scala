package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZorderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("interleaveBits: known Morton codes") {
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val out = df.select(
      Layout.interleaveBits(Seq(col("x"), col("y")), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit i of x → position 2i; bit i of y → position 2i+1
    // (3,0)=0b0101=5  (0,3)=0b1010=10  (3,3)=0b1111=15  (2,1)=0b0110=6
    assert(out === Seq(5L, 10L, 15L, 6L))
  }

  test("zValue scales ranges and clamps the max value into the top code") {
    val df = Seq(0.0, 50.0, 100.0).toDF("v")
    val out = df.select(Layout.zValue(Seq(col("v")), Seq((0.0, 100.0)), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out.head === 0L)
    assert(out(1) === 7L)   // 50/100 * 15 = 7.5 → floor 7
    assert(out(2) === 15L)  // max clamps to 2^4-1
  }

  test("zValue clamps out-of-range values instead of wrapping them") {
    val df = Seq(-50.0, 150.0).toDF("v") // beyond the declared [0,100] range
    val out = df.select(Layout.zValue(Seq(col("v")), Seq((0.0, 100.0)), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(0L, 15L)) // below→bottom code, above→top code
  }

  test("zorderWrite degrades gracefully on empty input and all-null columns") {
    val dir = tempDir("zorder-edge")
    Layout.zorderWrite(Seq.empty[(Int, Int)].toDF("a", "b"), Seq("a", "b"),
      s"$dir/empty", numFiles = 2)
    assert(spark.read.parquet(s"$dir/empty").count() === 0)
    Layout.zorderWrite(
      Seq((Option.empty[Int], 1), (Option.empty[Int], 2)).toDF("a", "b"),
      Seq("a", "b"), s"$dir/nulls", numFiles = 2)
    assert(spark.read.parquet(s"$dir/nulls").count() === 2)
  }

  test("z-ordered files have tight bounding boxes on BOTH dimensions") {
    // grid data: x,y uniform over [0,100) — linear x-sort leaves every
    // file's y-range spanning the full domain; z-order must not
    val rows = for (x <- 0 until 100; y <- 0 until 100) yield (x, y)
    val df = rows.toDF("x", "y")
    val dir = tempDir("zorder")

    Layout.zorderWrite(df, Seq("x", "y"), s"$dir/z", numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")

    def overlapping(path: String): Long = {
      // per-file bounding boxes, as a parquet scan with min/max would see
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
             min("y").as("y0"), max("y").as("y1"))
      // point-ish query box: x in [10,15], y in [10,15]
      boxes.filter(col("x1") >= 10 && col("x0") <= 15 &&
                   col("y1") >= 10 && col("y0") <= 15).count()
    }
    val z = overlapping(s"$dir/z")
    val linear = overlapping(s"$dir/linear")
    // linear layout: the x-range hits 1-2 files but each spans all y —
    // z-order should touch strictly fewer boxes than a same-file-count
    // linear layout once BOTH predicates apply
    assert(z <= linear, s"z-order touched $z boxes vs linear $linear")
    val totalZ = spark.read.parquet(s"$dir/z")
      .select(input_file_name()).distinct().count()
    assert(z < totalZ, s"z-order pruned nothing: $z of $totalZ files overlap")
  }

  test("zorderWrite result content equals input") {
    val df = (1 to 500).map(i => (i % 37, i % 11, s"p$i")).toDF("a", "b", "v")
    val dir = tempDir("zorder-rt") + "/t"
    Layout.zorderWrite(df, Seq("a", "b"), dir, numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 500)
    assert(back.select("v").collect().map(_.getString(0)).toSet ===
           (1 to 500).map(i => s"p$i").toSet)
  }
}
