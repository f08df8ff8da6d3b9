package graft.who

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.PageFetcher
import graft.sources.odata.PageFetcherFactory

/** Reference-fixture WHO API stub (numbers served as JSON numbers to
  * exercise the number→string ingest coercion). Top-level so the DSv2
  * `fetcherClass` seam can instantiate it reflectively on executors. */
private[who] object WhoStubData {
  val indicatorsBody: String =
    """{"value": [
      {"IndicatorCode": "WHOSIS_000001", "IndicatorName": "Life expectancy at birth (years)", "Language": "EN"},
      {"IndicatorCode": "LIFE_EXPECTANCY_0", "IndicatorName": "Life expectancy at age 60 (years)", "Language": "EN"},
      {"IndicatorCode": "WHOSIS_000001", "IndicatorName": "Life expectancy at birth (years)", "Language": "EN"}
    ]}"""

  val countriesBody: String =
    """{"value": [
      {"Code": "USA", "Title": "United States of America"},
      {"Code": "CAN", "Title": "Canada"},
      {"Code": "MEX", "Title": "Mexico"},
      {"Code": "USA", "Title": "United States of America"},
      {"Code": "GBR", "Title": "United Kingdom"}
    ]}"""

  def obs(id: Int, ind: String, cty: String, year: String, num: Any, v: Any): String =
    s"""{"Id": $id, "IndicatorCode": "$ind", "SpatialDim": "$cty", "SpatialDimType": "COUNTRY",
        "TimeDim": "$year", "TimeDimType": "YEAR", "NumericValue": $num, "Value": $v}"""
}

private[who] class WhoStub extends PageFetcher {
  import WhoStubData._
  override def fetch(url: String): (Int, String) = {
    val body =
      if (url.contains("/Indicator?")) indicatorsBody
      else if (url.contains("DIMENSION/COUNTRY")) countriesBody
      else if (url.contains("WHOSIS_000001") && url.contains("%27USA%27"))
        s"""{"value": [${obs(1, "WHOSIS_000001", "USA", "2019", 78.5, 78.5)},
                       ${obs(1, "WHOSIS_000001", "USA", "2019", 78.5, 78.5)}]}"""
      else if (url.contains("WHOSIS_000001") && url.contains("%27CAN%27"))
        s"""{"value": [${obs(2, "WHOSIS_000001", "CAN", "2019", 82.0, 82.0)}]}"""
      else if (url.contains("WHOSIS_000001") && url.contains("%27GBR%27"))
        s"""{"value": [${obs(5, "WHOSIS_000001", "GBR", "2020-2020", 80.4, 80.4)}]}"""
      else if (url.contains("LIFE_EXPECTANCY_0") && url.contains("%27MEX%27"))
        s"""{"value": [${obs(3, "LIFE_EXPECTANCY_0", "MEX", "2018", 75.0, 75.0)}]}"""
      else """{"value": []}"""
    (200, body)
  }
}

/** No-arg factory for the DSv2 connector path (reflective instantiation). */
class WhoStubFactory extends PageFetcherFactory {
  override def create(): PageFetcher = new WhoStub
}

/** End-to-end pipeline on a stubbed OData API serving the reference fixtures.
  * EP2 shape: reference etl/local_run.py:34-117. */
class PipelineSpec extends AnyFunSuite with SparkSpec {
  import WhoStubData.obs

  test("pipeline end-to-end: extract → transform → validate → upsert → DQ") {
    val wh = tempDir("graft-wh")
    val cfg = PipelineConfig(
      baseUrl = "http://who/api",
      warehouseDir = s"$wh/warehouse",
      stateDir = s"$wh/state")

    val report = Pipeline.run(spark, new WhoStub, cfg)

    assert(report.indicatorsExtracted === 3)
    assert(report.countriesExtracted === 5)
    // 7: USA appears twice in the raw country list, so its page is fetched
    // twice (2+2), + CAN 1 + GBR 1 + MEX 1 — faithful to the reference,
    // which builds country_codes from the RAW extract (dag:113-117).
    assert(report.observationsExtracted === 7)
    assert(report.indicatorsLoaded === 2)      // dedup 3→2
    assert(report.countriesLoaded === 4)       // dedup 5→4
    assert(report.observationsLoaded === 4)    // dedup 5→4 (dup Id=1)
    assert(report.rejectedRecords === 0)
    assert(report.dq.passed)

    // "2020-2020" year normalized through the whole pipe
    val fact = spark.read.parquet(s"${cfg.warehouseDir}/fact_observation")
    assert(fact.filter(col("spatial_dim") === "GBR")
      .collect().head.getAs[Int]("time_dim") === 2020)

    // J1 analytics shape over the warehouse (reference README.md:141-150)
    val dimC = spark.read.parquet(s"${cfg.warehouseDir}/dim_country")
    val dimI = spark.read.parquet(s"${cfg.warehouseDir}/dim_indicator")
    val j1 = fact
      .join(dimC, fact("spatial_dim") === dimC("country_code"))
      .join(dimI, Seq("indicator_code"))
      .filter(col("indicator_name").like("Life expectancy at birth%"))
      .select("country_name", "time_dim", "numeric_value")
    assert(j1.count() === 3) // USA, CAN, GBR

    // re-run is idempotent (upsert semantics)
    val report2 = Pipeline.run(spark, new WhoStub, cfg)
    assert(report2.observationsLoaded === 4)
    assert(report2.indicatorsLoaded === 2)
    assert(report2.countriesLoaded === 4)

    // watermark was written
    val state = new graft.sources.StateRepo(spark, cfg.stateDir)
    assert(state.get("who_gho_etl").flatMap(_.last_successful_run_at).isDefined)
  }

  test("connector mode: DSv2 extraction fans out per (indicator,country), identical results") {
    val wh = tempDir("graft-wh-dsv2")
    val cfg = PipelineConfig(
      baseUrl = "http://who/api",
      warehouseDir = s"$wh/warehouse",
      stateDir = s"$wh/state",
      fetcherFactoryClass = Some(classOf[WhoStubFactory].getName))

    // one InputPartition — one Spark task — per (indicator, country) pair:
    // 2 indicators × 5 raw country codes (USA duplicated, as the reference
    // builds the list from the raw extract) = 10 scan partitions
    val grid = Pipeline.observationFrame(spark, cfg,
      classOf[WhoStubFactory].getName,
      Seq("WHOSIS_000001", "LIFE_EXPECTANCY_0"),
      Seq("USA", "CAN", "MEX", "USA", "GBR"))
    assert(grid.rdd.getNumPartitions === 10)

    val report = Pipeline.run(spark, new WhoStub, cfg)
    // byte-for-byte the sequential path's numbers
    assert(report.observationsExtracted === 7)
    assert(report.indicatorsLoaded === 2)
    assert(report.countriesLoaded === 4)
    assert(report.observationsLoaded === 4)
    assert(report.rejectedRecords === 0)
    assert(report.dq.passed)

    // warehouse content identical to the sequential path, including the
    // first-wins survivor of the duplicated Id=1 observation
    val fact = graft.operators.Upsert.readPartitionedTable(
      spark, s"${cfg.warehouseDir}/fact_observation")
    assert(fact.filter(col("spatial_dim") === "GBR")
      .head().getAs[Int]("time_dim") === 2020)
    assert(fact.filter(col("observation_id") === 1L)
      .head().getAs[Double]("numeric_value") === 78.5)
  }

  test("JDBC warehouse: pipeline loads dims+fact into the database, LWW across runs, dead letter") {
    val wh = tempDir("graft-wh-jdbc")
    val url = s"jdbc:derby:$wh/db;create=true"
    val props = new java.util.Properties()
    val cfg = PipelineConfig("http://who/api", s"$wh/warehouse", s"$wh/state",
      jdbcWarehouse = Some(JdbcWarehouse(url,
        dialect = graft.operators.JdbcUpsert.AnsiMerge)))

    val report = Pipeline.run(spark, new WhoStub, cfg)
    assert(report.indicatorsLoaded === 2)
    assert(report.countriesLoaded === 4)
    assert(report.observationsLoaded === 4)
    assert(report.dq.passed)
    // nothing was written to the parquet warehouse — the load went to JDBC
    assert(!new java.io.File(s"${cfg.warehouseDir}/fact_observation").exists())

    // last-writer-wins across runs, straight from the database
    val stub2 = new WhoStub {
      override def fetch(u: String): (Int, String) =
        if (u.contains("WHOSIS_000001") && u.contains("%27CAN%27"))
          (200, s"""{"value": [${obs(2, "WHOSIS_000001", "CAN", "2019", 83.3, 83.3)}]}""")
        else super.fetch(u)
    }
    val report2 = Pipeline.run(spark, stub2, cfg)
    assert(report2.observationsLoaded === 4) // same keys, no growth
    val fact = spark.read.jdbc(url, "fact_observation", props)
    assert(fact.filter(col("spatial_dim") === "CAN")
      .head().getAs[Double]("numeric_value") === 83.3)

    // dead letter lands in the database too
    val stub3 = new WhoStub {
      override def fetch(u: String): (Int, String) =
        if (u.contains("LIFE_EXPECTANCY_0") && u.contains("%27MEX%27"))
          (200, """{"value": [{"Id": null, "IndicatorCode": "LIFE_EXPECTANCY_0",
            "SpatialDim": "MEX", "SpatialDimType": "COUNTRY", "TimeDim": "2018",
            "TimeDimType": "YEAR", "NumericValue": 75.0, "Value": 75.0}]}""")
        else super.fetch(u)
    }
    val report3 = Pipeline.run(spark, stub3, cfg)
    assert(report3.rejectedRecords === 1)
    val rej = spark.read.jdbc(url, "rejected_record", props).collect()
    assert(rej.length === 1)
    assert(rej.head.getAs[String]("error_details").contains("observation_id is required"))
  }

  test("staged mode (EP1): JSON file handoff produces identical results") {
    val wh = tempDir("graft-wh-staged")
    val cfg = PipelineConfig("http://who/api", s"$wh/warehouse", s"$wh/state",
      stageDir = Some(s"$wh/stage"))
    val report = Pipeline.run(spark, new WhoStub, cfg)
    assert(report.observationsLoaded === 4)
    assert(report.indicatorsLoaded === 2)
    assert(report.dq.passed)
    // the stage files exist and are re-readable raw JSON
    assert(new java.io.File(s"$wh/stage/observations_raw").exists())
    assert(spark.read.json(s"$wh/stage/observations_raw").count() === 7)
  }

  test("second batch updates values last-writer-wins across runs") {
    val wh = tempDir("graft-wh-batches")
    val cfg = PipelineConfig("http://who/api", s"$wh/warehouse", s"$wh/state")
    Pipeline.run(spark, new WhoStub, cfg)
    // batch 2: CAN observation revised (82.0 → 83.3)
    val stub2 = new WhoStub {
      override def fetch(url: String): (Int, String) =
        if (url.contains("WHOSIS_000001") && url.contains("%27CAN%27"))
          (200, s"""{"value": [${obs(2, "WHOSIS_000001", "CAN", "2019", 83.3, 83.3)}]}""")
        else super.fetch(url)
    }
    val report2 = Pipeline.run(spark, stub2, cfg)
    assert(report2.observationsLoaded === 4) // same keys, no growth
    val fact = graft.operators.Upsert.readPartitionedTable(
      spark, s"${cfg.warehouseDir}/fact_observation")
    assert(fact.filter(col("spatial_dim") === "CAN")
      .head().getAs[Double]("numeric_value") === 83.3)
  }

  test("pipeline persists rejected records to the dead-letter table") {
    val wh = tempDir("graft-wh2")
    val stub = new WhoStub {
      override def fetch(url: String): (Int, String) =
        if (url.contains("LIFE_EXPECTANCY_0") && url.contains("%27MEX%27"))
          // Id null → required-field rejection after transform keeps the row
          (200, s"""{"value": [{"Id": null, "IndicatorCode": "LIFE_EXPECTANCY_0",
            "SpatialDim": "MEX", "SpatialDimType": "COUNTRY", "TimeDim": "2018",
            "TimeDimType": "YEAR", "NumericValue": 75.0, "Value": 75.0},
            ${obs(3, "LIFE_EXPECTANCY_0", "MEX", "2018", 75.0, 75.0)}]}""")
        else super.fetch(url)
    }
    val cfg = PipelineConfig("http://who/api", s"$wh/warehouse", s"$wh/state")
    val report = Pipeline.run(spark, stub, cfg)
    assert(report.rejectedRecords === 1)
    val rej = spark.read.parquet(s"${cfg.warehouseDir}/rejected_record").collect()
    assert(rej.length === 1)
    assert(rej.head.getAs[String]("error_details").contains("observation_id is required"))
  }

  test("DQ-failure hook fires with the failed report; the default throws") {
    // every observation page empty → factRowCount = 0 → the A1 gate fails
    val emptyObs = new WhoStub {
      override def fetch(u: String): (Int, String) =
        if (u.contains("/Indicator?") || u.contains("DIMENSION/COUNTRY"))
          super.fetch(u)
        else (200, """{"value": []}""")
    }
    // pluggable hook (the reference's email_on_failure seam, dag:36-39):
    // notified with the gate's exact view, run completes, report returned
    val wh = tempDir("graft-wh-dqhook")
    val cfg = PipelineConfig("http://who/api", s"$wh/warehouse", s"$wh/state")
    var notified: Option[DqReport] = None
    val report = Pipeline.run(spark, emptyObs, cfg,
      onDqFailure = dq => notified = Some(dq))
    assert(!report.dq.passed)
    assert(notified.exists(_.factRowCount === 0))
    // even with a non-throwing hook, a DQ-failed run must NOT advance the
    // success watermark — etl_state never records the run as successful
    // (the reference's failed task blocks the DAG run entirely)
    val state = new graft.sources.StateRepo(spark, cfg.stateDir)
    assert(state.get("who_gho_etl").forall(_.last_successful_run_at.isEmpty))

    // default hook: the run fails loudly, like the reference's failed task
    val wh2 = tempDir("graft-wh-dqhook2")
    val cfg2 = PipelineConfig("http://who/api", s"$wh2/warehouse", s"$wh2/state")
    val e = intercept[IllegalStateException] {
      Pipeline.run(spark, emptyObs, cfg2)
    }
    assert(e.getMessage.contains("DQ gates FAILED"))
  }
}
