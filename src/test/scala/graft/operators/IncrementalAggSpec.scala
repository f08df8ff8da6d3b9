package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IncrementalAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(ids: Range) =
    ids.map(i => (i.toLong % 5, s"t${i % 3}", i.toDouble)).toDF("k", "t", "v")

  test("init + update equals the direct aggregation of all rows") {
    val b1 = rows(1 to 60)
    val b2 = rows(61 to 100)
    val incremental = IncrementalAgg.update(
      IncrementalAgg.init(b1, Seq("k", "t"), Map("total" -> col("v"))),
      b2, Seq("k", "t"), Map("total" -> col("v")))
    val direct = rows(1 to 100).groupBy("k", "t")
      .agg(count(lit(1)).as("n_events"), sum("v").as("total"))
    val a = incremental.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val d = direct.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(a.keySet === d.keySet)
    a.foreach { case (k, (n, tot)) =>
      assert(n === d(k)._1)
      assert(math.abs(tot - d(k)._2) < 1e-9)
    }
  }

  test("a batch with brand-new keys inserts them") {
    val t0 = IncrementalAgg.init(Seq((1L, 1.0)).toDF("k", "v"), Seq("k"), Map("total" -> col("v")))
    val out = IncrementalAgg.update(t0, Seq((2L, 5.0), (2L, 7.0)).toDF("k", "v"),
      Seq("k"), Map("total" -> col("v")))
    val m = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m === Map(1L -> ((1L, 1.0)), 2L -> ((2L, 12.0))))
  }

  test("folding three batches is order-insensitive on counts") {
    val batches = Seq(rows(1 to 30), rows(31 to 70), rows(71 to 100))
    def fold(bs: Seq[org.apache.spark.sql.DataFrame]) =
      bs.tail.foldLeft(IncrementalAgg.init(bs.head, Seq("k"), Map("total" -> col("v")))) {
        (acc, b) => IncrementalAgg.update(acc, b, Seq("k"), Map("total" -> col("v")))
      }.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fold(batches) === fold(batches.reverse))
  }
}
