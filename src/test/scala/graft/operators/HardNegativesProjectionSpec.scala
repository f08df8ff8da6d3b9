package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hard-negative mining and random projection: correctness against an
  * in-test brute force, salt-invariance of the two-phase top-k, and the
  * determinism/linearity/JL-quality properties of the sign projection. */
class HardNegativesProjectionSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private def queriesFrame = emb.filter(col("vec_id") < 3)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"),
      col("label").as("qlabel"))

  test("hard negatives match an in-test brute force") {
    val got = Similarity.hardNegatives(emb, queriesFrame, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    val vecs = emb.collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble), r.getInt(2))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // ranks on the 6-place-quantized cosine, mirroring the operator's
    // rank-on-c6 discipline (round-13 advisor)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = vecs.filter(_._1 < 3).flatMap { case (qid, qv, qlabel) =>
      vecs.filter(v => v._3 != qlabel && v._1 != qid)
        .map(v => (v._1, r6(cos(v._2, qv))))
        .sortBy { case (id, c) => (-c, id) }
        .take(5).zipWithIndex
        .map { case ((id, _), i) => (qid, i + 1, id) }
    }.toSet
    assert(got === want)
  }

  test("driver finisher == distributed two-phase windows cell-for-cell (cap 0 vs default)") {
    // pure rank logic, so the equality is BIT-exact, not just rounded-close
    val viaDriver = Similarity.hardNegatives(emb, queriesFrame, k = 5)
      .collect().map(_.toSeq).toSet
    spark.conf.set("graft.margin.maxDriverScores", "0")
    val viaDist =
      try Similarity.hardNegatives(emb, queriesFrame, k = 5)
        .collect().map(_.toSeq).toSet
      finally spark.conf.unset("graft.margin.maxDriverScores")
    assert(viaDriver === viaDist)
    assert(viaDriver.nonEmpty)
  }

  test("two-phase top-k is salt-invariant") {
    val a = Similarity.hardNegatives(emb, queriesFrame, k = 4, salts = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Similarity.hardNegatives(emb, queriesFrame, k = 4, salts = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a === b)
  }

  test("negatives never share the query's label") {
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    Similarity.hardNegatives(emb, queriesFrame, k = 5).collect().foreach { r =>
      assert(labels(r.getLong(2)) !== labels(r.getLong(0)),
        s"negative ${r.getLong(2)} shares label with query ${r.getLong(0)}")
      assert(r.getLong(2) !== r.getLong(0))
    }
  }

  test("random projection is deterministic and linear") {
    val p1 = Similarity.randomProjection(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val p2 = Similarity.randomProjection(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p1 === p2)

    // proj(2v) == 2*proj(v) up to the output rounding
    val doubled = emb.withColumn("embedding",
      transform(col("embedding"), x => (x * lit(2.0f)).cast("float")))
    val pd = Similarity.randomProjection(doubled).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    p1.foreach { case (k, v) =>
      assert(math.abs(pd(k) - 2 * v) < 1e-4, s"$k: ${pd(k)} vs ${2 * v}")
    }
  }

  test("projection roughly preserves cosine (JL at 16 dims)") {
    val orig = emb.limit(40).collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)
    }
    val ids = orig.map(_._1).toSet
    val proj = Similarity.randomProjection(emb.filter(col("vec_id").isin(ids.toSeq: _*)))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)).map(_.getDouble(2)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val errs = for {
      (ia, va) <- orig; (ib, vb) <- orig if ia < ib
    } yield math.abs(cos(va, vb) - cos(proj(ia), proj(ib)))
    val mean = errs.sum / errs.length
    // JL at k=16 gives ~1/sqrt(16) = 0.25 expected additive error; the
    // data is fixed so this is a deterministic regression pin, not a
    // statistical gamble
    assert(mean < 0.3, f"mean cosine distortion $mean%.3f")
  }
}
