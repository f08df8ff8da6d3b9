package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the failure-honest headline arithmetic of [[Bench]]: a crashed
  * query's `-1.0` sentinel must never LOWER the published total (the
  * round-10 artifact shipped 88.66s for 92.66s of successful work plus
  * four crash sentinels), and every sentinel must be NAMED in `failed`
  * so a reader can't mistake a shrunken surface for a faster one. */
class BenchSpec extends AnyFunSuite {

  test("totalOf excludes failure sentinels: a crash makes the total LARGER, not smaller") {
    val clean = Map("a" -> 2.0, "b" -> 3.0)
    val withCrash = clean + ("c" -> -1.0)
    assert(Bench.totalOf(withCrash.values) == 5.0)
    // the buggy formulation (plain sum) would report 4.0 — a crashed query
    // "improving" the headline
    assert(withCrash.values.sum < Bench.totalOf(withCrash.values))
  }

  test("totalOf of an all-success map is the plain sum") {
    val m = Map("a" -> 1.5, "b" -> 0.25, "c" -> 4.0)
    assert(Bench.totalOf(m.values) == m.values.sum)
  }

  test("failedOf names exactly the sentinel-carrying queries, sorted") {
    val m = Map("q9" -> -1.0, "q1" -> 2.0, "q5" -> -1.0, "q3" -> 0.0)
    assert(Bench.failedOf(m) == Seq("q5", "q9"))
    assert(Bench.failedOf(Map("q1" -> 1.0)) == Seq.empty)
  }
}
