package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared local session for all suites (one JVM-wide session via
  * getOrCreate; suites must not stop it). */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    // fresh warehouse per JVM: the in-memory catalog forgets managed tables
    // between runs but their directories survive and block saveAsTable
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def df(schema: StructType, rows: Seq[Seq[Any]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    // coalesce(1) keeps ingest order deterministic for first-wins dedup tests
    spark.createDataFrame(rows.map(Row.fromSeq).asJava, schema).coalesce(1)
  }

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

/** The reference's pytest fixtures, ported verbatim
  * (reference tests/conftest.py:8-34; see FIXTURES.md §A). */
object WhoFixtures {
  import graft.who.Schemas

  val rawObservations: Seq[Seq[Any]] = Seq(
    Seq("1", "WHOSIS_000001", "USA", "COUNTRY", "2019", "YEAR", "78.5", "78.5"),
    Seq("2", "WHOSIS_000001", "CAN", "COUNTRY", "2019", "YEAR", "82.0", "82.0"),
    Seq("3", "LIFE_EXPECTANCY_0", "MEX", "COUNTRY", "2018", "YEAR", "75.0", "75.0"),
    Seq("1", "WHOSIS_000001", "USA", "COUNTRY", "2019", "YEAR", "78.5", "78.5"), // duplicate
    Seq("4", "NO_DATA", "NON", "COUNTRY", "2022", "YEAR", null, "No data"),
    Seq("5", "WHOSIS_000001", "GBR", "COUNTRY", "2020-2020", "YEAR", "80.4", "80.4"))

  val rawIndicators: Seq[Seq[Any]] = Seq(
    Seq("WHOSIS_000001", "Life expectancy at birth (years)", "EN"),
    Seq("LIFE_EXPECTANCY_0", "Life expectancy at age 60 (years)", "EN"),
    Seq("WHOSIS_000001", "Life expectancy at birth (years)", "EN")) // duplicate

  val rawCountries: Seq[Seq[Any]] = Seq(
    Seq("USA", "United States of America"),
    Seq("CAN", "Canada"),
    Seq("MEX", "Mexico"),
    Seq("USA", "United States of America")) // duplicate

  val obsSchema = Schemas.rawObservation
  val indSchema = Schemas.rawIndicator
  val ctySchema = Schemas.rawCountry
}
