package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Scalar-quantization error report and vocabulary coverage curve:
  * brute-force replicas on real data, the half-step error bound the codec
  * guarantees, level monotonicity, degenerate-dimension exactness, and
  * the Zipf-curve invariants. */
class CompressCoverageSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val docs =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("quantization report matches an in-test brute force") {
    val got = VectorCompress.scalarQuantizeError(emb).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val vecs = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val dim = vecs.head._2.length
    val lo = Array.tabulate(dim)(i => vecs.map(_._2(i)).min)
    val hi = Array.tabulate(dim)(i => vecs.map(_._2(i)).max)
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    vecs.foreach { case (id, v) =>
      val errs = v.indices.map { i =>
        val xr =
          if (hi(i) == lo(i)) lo(i)
          else {
            val q = math.min(255.0, math.max(0.0,
              math.floor((v(i) - lo(i)) * 255.0 / (hi(i) - lo(i)) + 0.5)))
            lo(i) + q * (hi(i) - lo(i)) / 255.0
          }
        v(i) - xr
      }
      val mse = round6(errs.foldLeft(0.0)((a, d) => a + d * d) / dim)
      val mx = round6(errs.map(math.abs).max)
      assert(got(id) === ((mse, mx)), s"vec $id")
    }
  }

  test("max abs error respects the half-step bound") {
    val stats = emb.select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg((max(col("x").cast("double")) - min(col("x").cast("double")))
        .as("span"))
      .agg(max(col("span"))).head().getDouble(0)
    val bound = stats / (2.0 * 255.0) + 1e-9
    val worst = VectorCompress.scalarQuantizeError(emb)
      .agg(max(col("max_abs_err"))).head().getDouble(0)
    assert(worst <= bound, s"worst $worst vs half-step bound $bound")
  }

  test("finer levels reduce mean error") {
    def meanMse(levels: Int) =
      VectorCompress.scalarQuantizeError(emb, levels = levels)
        .agg(avg(col("mse"))).head().getDouble(0)
    assert(meanMse(255) < meanMse(15))
  }

  test("a constant dimension reconstructs exactly") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(0.5f, 1.0f, -2.0f)),
      (2L, Array(0.5f, 3.0f, 4.0f)),
      (3L, Array(0.5f, -1.0f, 0.0f))).toDF("vec_id", "embedding")
    // dim 0 is constant: its error contribution must be exactly zero, so
    // max_abs_err comes only from dims 1-2 and no row NaNs out
    val rows = VectorCompress.scalarQuantizeError(tiny).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(!r.getDouble(1).isNaN && !r.getDouble(2).isNaN)
    }
  }

  test("coverage curve matches an in-test brute force and is monotone") {
    val ranks = Seq(10, 100, 1000, 5000)
    val got = TermWeighting.vocabCoverage(docs, ranks).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    val counts = docs.collect().flatMap { r =>
      r.getAs[String]("text").trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    }.groupBy(identity).map { case (t, a) => (t, a.length.toLong) }.toSeq
    val ordered = counts.sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum.toDouble
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = ranks.filter(_ <= ordered.length).map { r =>
      val cum = ordered.take(r).map(_._2).sum
      (r.toLong, cum, round6(cum / total))
    }
    assert(got.toSeq === want)
    // Zipf invariants: nondecreasing coverage, bounded by 1
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3 && a._2 <= b._2)
      case _ =>
    }
    got.foreach(r => assert(r._3 > 0.0 && r._3 <= 1.0))
  }
}
