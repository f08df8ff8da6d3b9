package graft.who

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, WhoFixtures}

class ValidateWhoSpec extends AnyFunSuite with SparkSpec {

  private def transformedObs(rows: Seq[Seq[Any]] = WhoFixtures.rawObservations) =
    Transform.transformObservations(df(WhoFixtures.obsSchema, rows))

  test("clean fixture: all 5 transformed observations validate, none rejected") {
    val (valid, rejected) = ValidateWho.validateObservations(transformedObs())
    assert(valid.count() === 5)
    assert(rejected.count() === 0)
    val byId = valid.collect().map(o => o.observation_id -> o).toMap
    assert(byId(5L).time_dim === 2020)
    assert(byId(4L).numeric_value.isEmpty)
    assert(byId(4L).value === Some("No data"))
    assert(byId(1L).numeric_value === Some(78.5))
  }

  test("non-numeric id is rejected with field-level error") {
    val rows = WhoFixtures.rawObservations :+
      Seq("abc", "X", "FRA", "COUNTRY", "2020", "YEAR", "1.0", "1.0")
    val (valid, rejected) = ValidateWho.validateObservations(transformedObs(rows))
    assert(valid.count() === 5)
    val rej = rejected.collect()
    assert(rej.length === 1)
    assert(rej.head.getAs[String]("error_details").contains("observation_id must be numeric"))
    assert(rej.head.getAs[String]("record_data").contains("\"Id\":\"abc\""))
  }

  test("missing required field is rejected, valid+rejected == input") {
    val rows = WhoFixtures.rawObservations :+
      Seq("7", "X", "FRA", null, "2020", "YEAR", "1.0", "1.0") // null SpatialDimType
    val input = transformedObs(rows)
    val (valid, rejected) = ValidateWho.validateObservations(input)
    assert(valid.count() + rejected.count() === input.count())
    assert(rejected.collect().head.getAs[String]("error_details")
      === "spatial_dim_type is required")
  }

  test("indicators: typed output with alias mapping") {
    val (valid, rejected) = ValidateWho.validateIndicators(
      Transform.transformIndicators(df(WhoFixtures.indSchema, WhoFixtures.rawIndicators)))
    assert(rejected.count() === 0)
    val ind = valid.collect().sortBy(_.indicator_code)
    assert(ind.map(_.indicator_code).toSeq === Seq("LIFE_EXPECTANCY_0", "WHOSIS_000001"))
    assert(ind.last.indicator_name === "Life expectancy at birth (years)")
  }

  test("countries: typed output with alias mapping") {
    val (valid, rejected) = ValidateWho.validateCountries(
      Transform.transformCountries(df(WhoFixtures.ctySchema, WhoFixtures.rawCountries)))
    assert(rejected.count() === 0)
    assert(valid.collect().map(_.country_code).sorted.toSeq === Seq("CAN", "MEX", "USA"))
  }
}
