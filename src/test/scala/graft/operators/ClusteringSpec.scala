package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Behavior tests for distributed Lloyd refinement (q118) — the
  * cross-engine surface for the assignment kernel itself is q117's full
  * DuckDB oracle; here we assert the ITERATION recovers planted
  * structure and honors Lloyd's monotonicity invariant. */
class ClusteringSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("lloydRefine: recovers three planted well-separated clusters") {
    // ids 1..3 land one per planted cluster, so the deterministic
    // smallest-ids init starts spread (the converging regime); jitter is
    // a fixed per-point offset, no RNG (repo rule: no Math.random)
    val centersTruth = Seq((0.0, 0.0), (10.0, 0.0), (0.0, 10.0))
    val pts = (0 until 30).map { i =>
      val c = i % 3
      val (cx, cy) = centersTruth(c)
      val jx = ((i * 7) % 5 - 2) * 0.05 // in [-0.1, 0.1]
      val jy = ((i * 11) % 5 - 2) * 0.05
      ((i + 1).toLong, Seq((cx + jx).toFloat, (cy + jy).toFloat))
    }
    val in = pts.toDF("vec_id", "embedding")
    val out = Clustering.lloydRefine(in, k = 3, iters = 4)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    // monotone non-increasing inertia (the operator also self-gates this)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 + 1e-9, s"inertia rose: $a -> $b")
    case _ => () }
    // converged: total inertia == sum of squared jitters (~30 * <=0.02),
    // far below one misassigned point's ~100 contribution
    assert(out.last._2 < 1.0, s"did not recover planted clusters: ${out.last}")
    // and the final round barely moves the centers
    assert(out.last._3 < 1e-6, s"centers still moving: ${out.last}")
  }

  test("lloydRefine: k greater than corpus fails loudly, k == n converges to zero inertia") {
    val in = Seq((1L, Seq(0f, 0f)), (2L, Seq(5f, 5f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Clustering.lloydRefine(in, k = 3, iters = 1)
    }
    val out = Clustering.lloydRefine(in, k = 2, iters = 2).collect()
    assert(out.forall(_.getDouble(1) === 0.0))
  }
}
