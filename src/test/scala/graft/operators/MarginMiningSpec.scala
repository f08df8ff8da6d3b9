package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Margin-based pair mining: brute-force replica of the Artetxe–Schwenk
  * margin on real data, salt invariance of the query-side top-k stats,
  * and the defining property that margin ranks RELATIVE similarity (a
  * pair can out-rank another with higher raw cosine). */
class MarginMiningSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def sides = {
    val q = emb.filter(col("label") % 2 === 0 && col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val corpus = emb.filter(col("label") % 2 === 1)
    (corpus, q)
  }

  private def brute(k: Int, topN: Int) = {
    val vecs = emb.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (p, q) => p * q }.sum
      dot / (math.sqrt(a.map(v => v * v).sum) * math.sqrt(b.map(v => v * v).sum))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = vecs.filter(v => v._3 % 2 == 0 && v._1 % 10 == 0)
    val ys = vecs.filter(_._3 % 2 == 1)
    val c6 = (for (x <- xs; y <- ys) yield ((x._1, y._1), r6(cos(y._2, x._2)))).toMap
    // averages divide by the ACTUAL neighborhood (min(k, n)), matching the
    // operator's least(k, count) semantics (round-13 advisor)
    val dx = xs.map { x =>
      val top = ys.map(y => (c6((x._1, y._1)), y._1))
        .sortBy { case (c, id) => (-c, id) }.take(k)
      x._1 -> top.map(_._1).sum / top.size
    }.toMap
    val dy = ys.map { y =>
      val top = xs.map(x => (c6((x._1, y._1)), x._1))
        .sortBy { case (c, id) => (-c, id) }.take(k)
      y._1 -> top.map(_._1).sum / top.size
    }.toMap
    (for (x <- xs; y <- ys) yield {
      val c = c6((x._1, y._1))
      val denom = (dx(x._1) + dy(y._1)) / 2
      (x._1, y._1, c, if (denom == 0.0) 0.0 else r6(c / denom))
    }).sortBy { case (q, cand, _, m) => (-m, q, cand) }.take(topN)
  }

  test("top pairs match an in-test brute force") {
    val (corpus, q) = sides
    val got = Similarity.marginMining(corpus, q, k = 4, topN = 10)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === brute(4, 10).toSeq)
  }

  test("driver finisher == distributed path cell-for-cell (cap 0 vs default)") {
    val (corpus, q) = sides
    val viaDriver = Similarity.marginMining(corpus, q, k = 4, topN = 25)
      .collect().map(_.toSeq).toSeq
    spark.conf.set("graft.margin.maxDriverScores", "0")
    val viaDist =
      try Similarity.marginMining(corpus, q, k = 4, topN = 25)
        .collect().map(_.toSeq).toSeq
      finally spark.conf.unset("graft.margin.maxDriverScores")
    assert(viaDriver === viaDist)
    assert(viaDriver.nonEmpty)
  }

  test("salt count does not change the result") {
    val (corpus, q) = sides
    val a = Similarity.marginMining(corpus, q, topN = 10, salts = 2).collect()
    val b = Similarity.marginMining(corpus, q, topN = 10, salts = 64).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("margin re-ranks: ordering differs from raw cosine ordering") {
    val (corpus, q) = sides
    val rows = Similarity.marginMining(corpus, q, topN = 25).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    // margins must not be a monotone transform of cosine across the board
    val byMargin = rows.map(_._1).toSeq
    assert(byMargin !== byMargin.sorted.reverse,
      "margin order collapsed to cosine order — normalization is inert")
  }
}
