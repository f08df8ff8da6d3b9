package graft.who

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, WhoFixtures}

/** Golden behavior from reference tests/test_transform.py:4-32. */
class TransformSpec extends AnyFunSuite with SparkSpec {

  test("transform_observations: dedup 6→5, types coerced, year range parsed") {
    val raw = df(WhoFixtures.obsSchema, WhoFixtures.rawObservations)
    val out = Transform.transformObservations(raw).cache()

    assert(out.count() === 5) // exact duplicate Id=1 dropped
    assert(out.schema("NumericValue").dataType === DoubleType)
    assert(out.schema("TimeDim").dataType === IntegerType)

    val gbr = out.filter(col("SpatialDim") === "GBR").collect()
    assert(gbr.length === 1)
    assert(gbr.head.getAs[Int]("TimeDim") === 2020) // "2020-2020" → 2020

    val noData = out.filter(col("Id") === "4").collect().head
    assert(noData.isNullAt(noData.fieldIndex("NumericValue")))
    assert(noData.getAs[String]("Value") === "No data")
  }

  test("transform_observations: first occurrence wins on duplicate Id") {
    // change the later duplicate's Value so winner is observable
    val rows = WhoFixtures.rawObservations.updated(3,
      Seq("1", "WHOSIS_000001", "USA", "COUNTRY", "2019", "YEAR", "99.9", "99.9"))
    val out = Transform.transformObservations(df(WhoFixtures.obsSchema, rows))
    val id1 = out.filter(col("Id") === "1").collect().head
    assert(id1.getAs[Double]("NumericValue") === 78.5) // first row kept
  }

  test("transform_observations: missing columns added as nulls") {
    val slim = df(WhoFixtures.obsSchema, WhoFixtures.rawObservations)
      .select("Id", "IndicatorCode", "SpatialDim", "TimeDim")
    val out = Transform.transformObservations(slim)
    assert(out.columns.toSet.contains("SpatialDimType"))
    assert(out.count() === 5)
    assert(out.filter(col("SpatialDimType").isNotNull).count() === 0)
  }

  test("transform_observations: rows with null keys dropped after coercion") {
    val rows = WhoFixtures.rawObservations :+
      Seq("9", null, "FRA", "COUNTRY", "2020", "YEAR", "1.0", "1.0") :+ // null IndicatorCode
      Seq("10", "X", "FRA", "COUNTRY", "not-a-year", "YEAR", "1.0", "1.0") // unparseable year
    val out = Transform.transformObservations(df(WhoFixtures.obsSchema, rows))
    assert(out.count() === 5)
  }

  test("transform_observations: composite-key dedup when Id all null") {
    val rows = WhoFixtures.rawObservations.map(r => r.updated(0, null: Any))
    val out = Transform.transformObservations(df(WhoFixtures.obsSchema, rows))
    assert(out.count() === 5) // same dup collapses on (IndicatorCode,SpatialDim,TimeDim)
  }

  test("transform_indicators: dedup 3→2, exact column set") {
    val out = Transform.dropIngestOrder(
      Transform.transformIndicators(df(WhoFixtures.indSchema, WhoFixtures.rawIndicators)))
    assert(out.count() === 2)
    assert(out.columns.toSeq === Seq("IndicatorCode", "IndicatorName", "Language"))
  }

  test("transform_countries: dedup 4→3") {
    val out = Transform.transformCountries(df(WhoFixtures.ctySchema, WhoFixtures.rawCountries))
    assert(out.count() === 3)
  }

  test("first-wins survivor is pandas-identical on a multi-file staged read") {
    // Spark packs file-scan partitions by SIZE (largest first): the big
    // later file would claim partition 0, and a bare
    // monotonically_increasing_id would crown ITS duplicate the "first".
    // The (file, id) ingest order must keep the survivor from the file
    // written first — pandas keep='first' on the concatenated stage.
    val dir = tempDir("staged-order")
    def row(code: String, name: String) =
      s"""{"IndicatorCode": "$code", "IndicatorName": "$name", "Language": "EN"}"""
    // part-00000: 1 row — the TRUE first occurrence of DUP
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-00000.json"),
      row("DUP", "FIRST").getBytes)
    // part-00001: much larger, carries a conflicting DUP occurrence
    val filler = (1 to 50).map(i => row(s"IND_$i", s"Indicator number $i"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-00001.json"),
      (row("DUP", "SECOND") +: filler).mkString("\n").getBytes)

    val raw = spark.read.schema(Schemas.rawIndicator).json(dir)
    // precondition that makes the test non-vacuous: the big file really is
    // scheduled before the small one (size-ordered partitions)
    val firstPartFile = raw
      .select(org.apache.spark.sql.functions.input_file_name())
      .head().getString(0)
    assert(firstPartFile.contains("part-00001"),
      s"expected size-ordered scan to lead with part-00001, led with $firstPartFile")

    val out = Transform.transformIndicators(raw)
      .filter(org.apache.spark.sql.functions.col("IndicatorCode") === "DUP")
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("IndicatorName") === "FIRST")
  }
}
