package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  private val quotes = Seq(
    (1L, ts(0), 100.0), (1L, ts(10), 110.0), (1L, ts(20), 120.0),
    (2L, ts(5), 200.0)).toDF("qk", "qt", "price")

  test("asof: latest right row at or before each left time") {
    val trades = Seq(
      (1L, ts(5)),   // → 100.0 (t=0)
      (1L, ts(10)),  // → 110.0 (inclusive at equal time)
      (1L, ts(99)),  // → 120.0 (latest)
      (2L, ts(4)),   // → no match (first quote at t=5)
      (3L, ts(50))   // → no match (unknown key)
    ).toDF("tk", "tt")

    val out = AsOfJoin.asofJoin(trades, quotes, "tk", "qk", "tt", "qt",
      Seq("price" -> "quote_price"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000, r.getDouble(2)))
    assert(out.toSet === Set((1L, 5L, 100.0), (1L, 10L, 110.0), (1L, 99L, 120.0)))
  }

  test("asof left join keeps unmatched rows with null payload") {
    val trades = Seq((2L, ts(4)), (2L, ts(6))).toDF("tk", "tt")
    val out = AsOfJoin.asofJoin(trades, quotes, "tk", "qk", "tt", "qt",
      Seq("price" -> "quote_price"), joinType = "left")
      .orderBy("tt").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(2))
    assert(out(1).getDouble(2) === 200.0)
  }

  test("asof join plan is one shuffle + window, no range explosion") {
    val trades = Seq((1L, ts(5))).toDF("tk", "tt")
    val plan = AsOfJoin.asofJoin(trades, quotes, "tk", "qk", "tt", "qt",
      Seq("price" -> "p")).queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
