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
}
