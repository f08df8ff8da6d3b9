package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs at sf0.001 and produces rows, and every
  * query has an oracle (or is knowingly oracle-less). Hash-level checking
  * against DuckDB happens in the driver's gate + tools/check_correctness.py. */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  Queries.all.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with rows > 0") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }

  test("every query has an oracle") {
    val missing = Queries.all.keySet -- Queries.oracles.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("every oracle points at a declared query") {
    val dangling = Queries.oracles.keySet -- Queries.all.keySet
    assert(dangling.isEmpty, s"oracles without query: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
