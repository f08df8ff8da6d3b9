package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the ANN planted-recall hard gate ([[ExtQueries.plantedGate]]): a
  * missed planted near-duplicate must FAIL the declared query (red board),
  * a clean retrieval must pass, and the per-(query, dir) memoization must
  * skip repeat evaluations EXCEPT after a failure — a failing gate has to
  * keep failing on retry, not be absorbed by the cache. */
class PlantedGateSpec extends AnyFunSuite {

  test("gate throws when any planted id is missed, and keeps throwing on retry") {
    var calls = 0
    def run: (Set[Long], Set[Long]) = { calls += 1; (Set(1L), Set(1L, 2L)) }
    val e = intercept[IllegalStateException] {
      ExtQueries.plantedGate("gate-spec-miss", "d")(run)
    }
    assert(e.getMessage.contains("missed 1/2"))
    // the failure must not be memoized as "ran"
    intercept[IllegalStateException] {
      ExtQueries.plantedGate("gate-spec-miss", "d")(run)
    }
    assert(calls == 2)
  }

  test("gate passes on full recall and memoizes per (query, dir)") {
    var calls = 0
    def run: (Set[Long], Set[Long]) = { calls += 1; (Set(1L, 2L, 3L), Set(1L, 2L)) }
    ExtQueries.plantedGate("gate-spec-ok", "d")(run)
    ExtQueries.plantedGate("gate-spec-ok", "d")(run) // memoized: not re-run
    assert(calls == 1)
    ExtQueries.plantedGate("gate-spec-ok", "d2")(run) // new dir: runs
    assert(calls == 2)
  }

  test("annLshProbeHFor: every SF corpus lands on the intended side of " +
    "the threshold (the corpus EXCLUDES the query vector — round-14's " +
    "off-by-one shipped scan_frac 0.45 because 2000-row sf0.1 scored " +
    "as 1999)") {
    assert(ExtQueries.annLshProbeHFor(499L) === 3)   // sf0.001/sf0.01: 500 − 1
    assert(ExtQueries.annLshProbeHFor(999L) === 3)   // last wide-ball corpus
    assert(ExtQueries.annLshProbeHFor(1000L) === 2)  // first tight-ball corpus
    assert(ExtQueries.annLshProbeHFor(1999L) === 2)  // sf0.1: 2000 − 1
    assert(ExtQueries.annLshProbeHFor(19999L) === 2) // sf1: 20000 − 1
  }
}
