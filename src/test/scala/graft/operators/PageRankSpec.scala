package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PageRank has no SQL oracle (recursive CTEs cannot re-aggregate per
  * iteration), so this spec is the correctness authority: operator output
  * vs an in-memory reference implementation of the identical recurrence,
  * plus the mass-conservation and dangling-redistribution invariants. */
class PageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Reference power iteration over Maps — same recurrence, same
    * dangling handling. */
  private def reference(n: Int, edges: Seq[(Long, Long)], iters: Int,
                        d: Double = 0.85): Map[Long, Double] = {
    val ids = (1L to n.toLong).toSeq
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = ids.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = ids.filterNot(out.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = ids.map(id => id ->
        ((1.0 - d) / n + d * (in.getOrElse(id, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pagerank matches the reference recurrence on a cyclic graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    val got = Graph.pagerank(
      (1L to 3L).toDF("id"), edges.toDF("src", "dst"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = reference(3, edges, 10)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, rank) => assert(math.abs(rank - want(id)) < 1e-9) }
    // C has two in-links (one from the hub A) → highest rank
    assert(got(3L) > got(1L) && got(3L) > got(2L))
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
  }

  test("pagerank conserves mass with dangling vertices and isolates") {
    // 4 is dangling (in-links, no out-links); 5 is fully isolated
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 4L), (3L, 4L))
    val got = Graph.pagerank(
      (1L to 5L).toDF("id"), edges.toDF("src", "dst"), iterations = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = reference(5, edges, 12)
    got.foreach { case (id, rank) => assert(math.abs(rank - want(id)) < 1e-9) }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the sink accumulates more than the source feeding it
    assert(got(4L) > got(3L))
  }
}
