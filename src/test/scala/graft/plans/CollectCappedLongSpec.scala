package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The capped-collect contract q44's bucket-pair idiom relies on:
  * under-cap groups collect exactly their inputs, over-cap groups hold
  * EXACTLY cap elements at every point of the partial/merge execution
  * (the OOM bound), and the "cap = threshold + 1, filter size <= threshold"
  * pairing is deterministic even though the overflow subset is not. */
class CollectCappedLongSpec extends AnyFunSuite with SparkSpec {

  private def collected(rows: Seq[(Long, Long)], cap: Int,
                        parts: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    CollectCappedLong.register(spark)
    rows.toDF("k", "v").repartition(parts)
      .groupBy(col("k"))
      .agg(sort_array(CollectCappedLong.of(col("v"), cap)).as("vs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
      .toMap
  }

  test("under-cap groups collect exactly their inputs (collect_list parity)") {
    val rows = (1L to 10L).map(v => (v % 3, v))
    val got = collected(rows, cap = 51, parts = 4)
    assert(got(0L) === Seq(3L, 6L, 9L))
    assert(got(1L) === Seq(1L, 4L, 7L, 10L))
    assert(got(2L) === Seq(2L, 5L, 8L))
  }

  test("over-cap groups hold exactly cap elements, all drawn from the input") {
    val rows = (1L to 500L).map(v => (0L, v)) ++ Seq((1L, 7L))
    val got = collected(rows, cap = 51, parts = 8)
    assert(got(0L).length === 51)
    assert(got(0L).forall(v => v >= 1L && v <= 500L))
    assert(got(0L).distinct.length === 51) // a subset, not repeats
    assert(got(1L) === Seq(7L))
  }

  test("cap survives partial-aggregate merges: single partition and many partitions agree on size") {
    val rows = (1L to 200L).map(v => (0L, v))
    assert(collected(rows, cap = 10, parts = 1)(0L).length === 10)
    assert(collected(rows, cap = 10, parts = 16)(0L).length === 10)
  }

  test("nulls are skipped (collect_list's rule)") {
    import spark.implicits._
    CollectCappedLong.register(spark)
    val got = Seq((0L, Some(1L)), (0L, None), (0L, Some(2L)))
      .toDF("k", "v")
      .groupBy(col("k"))
      .agg(sort_array(CollectCappedLong.of(col("v"), 51)).as("vs"))
      .head().getSeq[Long](1)
    assert(got === Seq(1L, 2L))
  }

  test("q44 pairing: threshold filter removes overflowed groups deterministically") {
    import spark.implicits._
    CollectCappedLong.register(spark)
    // group 0: 60 members (over the 50 threshold), group 1: 3 members
    val rows = (1L to 60L).map(v => (0L, v)) ++ Seq((1L, 1L), (1L, 2L), (1L, 3L))
    val kept = rows.toDF("k", "v").repartition(8)
      .groupBy(col("k"))
      .agg(sort_array(CollectCappedLong.of(col("v"), 51)).as("vs"))
      .filter(size(col("vs")).between(2, 50))
      .collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("rejects non-long columns and non-positive caps at analysis time") {
    import spark.implicits._
    CollectCappedLong.register(spark)
    val strDf = Seq(("a", "b")).toDF("k", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      strDf.groupBy(col("k"))
        .agg(CollectCappedLong.of(col("v"), 5)).collect()
    }
    val longDf = Seq((0L, 1L)).toDF("k", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      longDf.groupBy(col("k"))
        .agg(CollectCappedLong.of(col("v"), 0)).collect()
    }
  }
}
