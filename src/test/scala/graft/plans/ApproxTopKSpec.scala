package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Misra–Gries guarantees under Spark's distributed partial/merge execution:
  * exactness below capacity, the frequency guarantee (count > N/(k+1) ⇒
  * present), and the bounded undercount — all with the input spread over
  * many partitions so partial-aggregate merges actually happen. */
class ApproxTopKSpec extends AnyFunSuite with SparkSpec {

  private def topk(terms: Seq[String], k: Int, parts: Int): Seq[(String, Long)] = {
    import spark.implicits._
    ApproxTopK.register(spark)
    val out = terms.toDF("term").repartition(parts)
      .agg(ApproxTopK.of(col("term"), k).as("top"))
      .head().getSeq[Row](0)
    out.map(r => (r.getString(0), r.getLong(1)))
  }

  test("exact when distinct terms fit the k counters") {
    val terms = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")
    val got = topk(terms, k = 8, parts = 4)
    assert(got === Seq(("a", 5L), ("b", 3L), ("c", 1L)))
  }

  test("frequency guarantee: every item above N/(k+1) survives, counts undercount by at most N/(k+1)") {
    // skewed stream: two heavy items in a sea of singletons
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2")
    val noise = (1 to 600).map(i => s"one_$i")
    val terms = scala.util.Random.shuffle(heavy ++ noise): Seq[String]
    val n = terms.length // 1300
    val k = 10
    val bound = n / (k + 1) // 118
    val got = topk(terms, k, parts = 8).toMap
    // hot1 (400 > 118) and hot2 (300 > 118) must be present...
    assert(got.contains("hot1") && got.contains("hot2"))
    // ...with estimates within [true - bound, true]
    assert(got("hot1") <= 400L && got("hot1") >= 400L - bound)
    assert(got("hot2") <= 300L && got("hot2") >= 300L - bound)
    // and the summary never exceeds k counters
    assert(got.size <= k)
  }

  test("SQL registration via extensions: graft_approx_topk usable in spark.sql") {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    import s.implicits._
    Seq("x", "x", "y").toDF("t").createOrReplaceTempView("tv")
    val rows = s.sql("SELECT graft_approx_topk(t, 4) AS top FROM tv")
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(rows === Seq(("x", 2L), ("y", 1L)))
  }
}
