package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Similarity.mmrRerank]] — greedy diversity selection semantics (q134
  * carries the cross-engine recursive-CTE oracle; this pins the behavior
  * the oracle replays). */
class MmrRerankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // id 1 and id 2 are EXACT duplicates near the query direction; id 3 is
  // equally relevant but on the other side of it. Pure relevance ranks
  // (1, 2, ...) — MMR must demote the duplicate below the diverse pick.
  private def emb = Seq(
    (1L, Seq(1.0, 0.1, 0.0)),
    (2L, Seq(1.0, 0.1, 0.0)),
    (3L, Seq(1.0, -0.1, 0.0)),
    (4L, Seq(0.0, 0.0, 1.0))
  ).toDF("vec_id", "embedding")

  private val q = Array(1.0, 0.0, 0.0)

  test("duplicate of the first pick is demoted below the diverse candidate") {
    val out = Similarity.mmrRerank(emb, q, k = 4)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(out === Seq(1L, 3L, 2L, 4L))
  }

  test("rank 1 is the brute-force top-1; relevance is the quantized cosine") {
    val rows = Similarity.mmrRerank(emb, q, k = 2).orderBy("rank").collect()
    assert(rows(0).getLong(1) === 1L) // max rel, min id tiebreak vs the clone
    val rel = rows(0).getDouble(2)
    assert(rel === BigDecimal(1.0 / math.sqrt(1.01))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // first pick's score is 7*rel (empty selected set => maxsim 0)
    assert(rows(0).getDouble(3) === BigDecimal(7.0 * rel)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("k beyond the pool returns the whole pool once; deterministic") {
    val a = Similarity.mmrRerank(emb, q, k = 10).collect()
    val b = Similarity.mmrRerank(emb, q, k = 10).collect()
    assert(a.length === 4)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.map(_.getLong(1)).distinct.length === 4)
  }
}
