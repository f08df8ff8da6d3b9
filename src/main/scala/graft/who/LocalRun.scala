package graft.who

import org.apache.spark.sql.SparkSession

import graft.sources.{HttpPageFetcher, PageFetcher}

/** Dev entry point — the reference's `etl/local_run.py` (EP2): the whole
  * pipeline sequentially in one process.
  *
  * Usage: `runMain graft.who.LocalRun <warehouseDir> [baseUrl] [limit]`
  *
  * With no `baseUrl` (or in the zero-egress test environment) it runs against
  * the built-in fixture stub, which serves the reference's conftest rows as
  * OData pages — the same shape `local_run.py --limit N` exercises against
  * the live API. */
object LocalRun {

  /** Deterministic offline stub serving the reference fixture data
    * (reference tests/conftest.py:8-34). */
  class FixtureStub extends PageFetcher {
    private def obs(id: Int, ind: String, cty: String, year: String, num: String, v: String) =
      s"""{"Id": $id, "IndicatorCode": "$ind", "SpatialDim": "$cty",
          "SpatialDimType": "COUNTRY", "TimeDim": "$year", "TimeDimType": "YEAR",
          "NumericValue": $num, "Value": $v}"""

    override def fetch(url: String): (Int, String) = {
      val body =
        if (url.contains("/Indicator?"))
          """{"value": [
            {"IndicatorCode": "WHOSIS_000001", "IndicatorName": "Life expectancy at birth (years)", "Language": "EN"},
            {"IndicatorCode": "LIFE_EXPECTANCY_0", "IndicatorName": "Life expectancy at age 60 (years)", "Language": "EN"},
            {"IndicatorCode": "WHOSIS_000001", "IndicatorName": "Life expectancy at birth (years)", "Language": "EN"}]}"""
        else if (url.contains("DIMENSION/COUNTRY"))
          """{"value": [
            {"Code": "USA", "Title": "United States of America"},
            {"Code": "CAN", "Title": "Canada"},
            {"Code": "MEX", "Title": "Mexico"},
            {"Code": "USA", "Title": "United States of America"},
            {"Code": "GBR", "Title": "United Kingdom"}]}"""
        else if (url.contains("WHOSIS_000001") && url.contains("%27USA%27"))
          s"""{"value": [${obs(1, "WHOSIS_000001", "USA", "2019", "78.5", "78.5")},
                         ${obs(1, "WHOSIS_000001", "USA", "2019", "78.5", "78.5")}]}"""
        else if (url.contains("WHOSIS_000001") && url.contains("%27CAN%27"))
          s"""{"value": [${obs(2, "WHOSIS_000001", "CAN", "2019", "82.0", "82.0")}]}"""
        else if (url.contains("WHOSIS_000001") && url.contains("%27GBR%27"))
          s"""{"value": [${obs(5, "WHOSIS_000001", "GBR", "2020-2020", "80.4", "80.4")}]}"""
        else if (url.contains("LIFE_EXPECTANCY_0") && url.contains("%27MEX%27"))
          s"""{"value": [${obs(3, "LIFE_EXPECTANCY_0", "MEX", "2018", "75.0", "75.0")}]}"""
        else """{"value": []}"""
      (200, body)
    }
  }

  def main(args: Array[String]): Unit = {
    val warehouseDir = args.headOption.getOrElse("/tmp/graft_warehouse")
    val baseUrl = args.lift(1).getOrElse("stub://who/api")
    val limit = args.lift(2).map(_.toInt)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-local-run")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fetcher: PageFetcher =
      if (baseUrl.startsWith("stub://")) new FixtureStub else new HttpPageFetcher()

    val cfg = PipelineConfig(
      baseUrl = baseUrl,
      warehouseDir = warehouseDir,
      stateDir = s"$warehouseDir/etl_state",
      devRunLimit = limit)

    val report = Pipeline.run(spark, fetcher, cfg)
    println(s"[local-run] extracted: ind=${report.indicatorsExtracted} " +
      s"cty=${report.countriesExtracted} obs=${report.observationsExtracted}")
    println(s"[local-run] loaded: dim_indicator=${report.indicatorsLoaded} " +
      s"dim_country=${report.countriesLoaded} fact_observation=${report.observationsLoaded} " +
      s"rejected=${report.rejectedRecords}")
    println(s"[local-run] dq: rows=${report.dq.factRowCount} " +
      s"nullKeys=${report.dq.nullKeyCount} passed=${report.dq.passed}")

    // EP3: the documented analytics queries over the loaded warehouse
    // (reference README.md:137-161).
    spark.read.parquet(s"$warehouseDir/fact_observation").createOrReplaceTempView("fact_observation")
    spark.read.parquet(s"$warehouseDir/dim_country").createOrReplaceTempView("dim_country")
    spark.read.parquet(s"$warehouseDir/dim_indicator").createOrReplaceTempView("dim_indicator")
    println("[local-run] J1 life-expectancy trend:")
    spark.sql(
      """SELECT dc.country_name, fo.time_dim AS year, fo.numeric_value
         FROM fact_observation fo
         JOIN dim_country dc ON fo.spatial_dim = dc.country_code
         JOIN dim_indicator di ON fo.indicator_code = di.indicator_code
         WHERE di.indicator_name LIKE 'Life expectancy at birth%'
         ORDER BY dc.country_name, year""").show(false)
    spark.stop()
  }
}
