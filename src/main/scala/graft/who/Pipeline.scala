package graft.who

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Upsert
import graft.sources.{ODataClient, PageFetcher, StateRepo}

/** End-to-end pipeline driver — the EP2 shape (reference etl/local_run.py:
  * 34-117): extract → transform → validate → upsert → DQ, one SparkSession
  * program, with rejected records always persisted (superset of the DAG path,
  * which drops them — SURVEY.md gotcha #5).
  */
final case class PipelineConfig(
    baseUrl: String,
    warehouseDir: String,
    stateDir: String,
    indicatorCodes: Seq[String] = Nil,
    pageSize: Int = 100,
    devRunLimit: Option[Int] = None,
    skipRequestErrors: Boolean = true,
    factBuckets: Int = 64,
    /** EP1 fidelity: when set, raw extracts are staged as JSON files and
      * re-read before transform (the Airflow-task file handoff,
      * reference dags/who_gho_etl_dag.py:94-129,143-158). When None, data
      * passes in memory (EP2 / local_run shape). */
    stageDir: Option[String] = None,
    /** When set, OBSERVATION extraction runs through the `graft-odata` DSv2
      * connector — one Spark task per (indicator, country) pair, the
      * cluster-parallel form of the reference's sequential fetch loops
      * (reference etl/extract.py:129-151). Names a no-arg
      * [[graft.sources.odata.PageFetcherFactory]] class loadable on
      * executors. When None, the driver-side client fetches sequentially
      * with per-page checkpoint/resume ([[graft.sources.StateRepo]]). The
      * DSv2 path resumes at PARTITION granularity: completed
      * (indicator,country) fetches persist under `<stateDir>/dsv2_resume`
      * and are served from disk on a re-run after a crash; the directory
      * is cleared once the extract lands. */
    fetcherFactoryClass: Option[String] = None,
    /** When set, the LOAD phase targets a transactional JDBC warehouse —
      * the reference's actual destination (Postgres; etl/load.py) — via
      * [[graft.operators.JdbcUpsert]]: dims + fact upserted, rejects
      * appended, DQ gates read back over JDBC. When None, the load targets
      * the parquet warehouse layout. */
    jdbcWarehouse: Option[JdbcWarehouse] = None)

/** JDBC warehouse target. `stringType` is the SQL type given to string
  * columns of auto-created tables — Spark's default CLOB/TEXT mappings
  * can't be merge keys on some databases. */
final case class JdbcWarehouse(
    url: String,
    dialect: graft.operators.JdbcUpsert.Dialect = graft.operators.JdbcUpsert.PostgresOnConflict,
    props: java.util.Properties = new java.util.Properties(),
    stringType: String = "VARCHAR(1024)")

/** A1/A2 gates (reference dags/who_gho_etl_dag.py:189-206). */
final case class DqReport(factRowCount: Long, nullKeyCount: Long) {
  def passed: Boolean = factRowCount > 0 && nullKeyCount == 0
  def describe: String =
    s"DQ gates FAILED: factRowCount=$factRowCount (gate: > 0), " +
      s"nullKeyCount=$nullKeyCount (gate: == 0)"
}

final case class PipelineReport(
    observationsExtracted: Int,
    indicatorsExtracted: Int,
    countriesExtracted: Int,
    indicatorsLoaded: Long,
    countriesLoaded: Long,
    observationsLoaded: Long,
    rejectedRecords: Long,
    dq: DqReport)

object Pipeline {

  /** The connector-backed raw-observation frame: one InputPartition — one
    * Spark task — per (indicator, country) pair, in the same grid order as
    * the reference's nested fetch loops, so `monotonically_increasing_id`
    * ingest order (and therefore first-wins dedup) matches the sequential
    * path. `devRunLimit` is pushed into the scan (paging stops at the
    * limit per partition; Spark's CollectLimit enforces it globally). */
  def observationFrame(spark: SparkSession, cfg: PipelineConfig, factory: String,
                       indicatorCodes: Seq[String], countryCodes: Seq[String]): org.apache.spark.sql.DataFrame = {
    val df = spark.read.format("graft-odata")
      .option("baseUrl", cfg.baseUrl)
      .option("fetcherClass", factory)
      .option("pageSize", cfg.pageSize.toString)
      .option("skipRequestErrors", cfg.skipRequestErrors.toString)
      .option("columns", Schemas.rawObservation.fieldNames.mkString(","))
      .option("indicatorCodes", indicatorCodes.mkString(","))
      .option("countryCodes", countryCodes.mkString(","))
      // partition-level resume: a crashed run's completed pairs are served
      // from disk on the next attempt instead of refetched (ST1 parity at
      // cluster parallelism; cleared in run() after the extract lands)
      .option("resumeDir", dsv2ResumeDir(cfg))
      .load()
    cfg.devRunLimit.fold(df)(df.limit)
  }

  private[who] def dsv2ResumeDir(cfg: PipelineConfig): String =
    s"${cfg.stateDir}/dsv2_resume"

  /** Default DQ-failure action: fail the run loudly — the engine analog of
    * the reference DAG's task failure (the Airflow task raises and the DAG
    * run is marked failed, reference dags/who_gho_etl_dag.py:189-206). */
  val FailOnDq: DqReport => Unit = dq => throw new IllegalStateException(dq.describe)

  /** `onDqFailure` is the notification seam the reference wires as
    * `email_on_failure` (dags/who_gho_etl_dag.py:36-39): it fires with the
    * failed report BEFORE the success watermark is advanced, so a pager /
    * email / metrics hook sees exactly what the gate saw. The default
    * ([[FailOnDq]]) throws, matching the reference's failed-task behavior;
    * a non-throwing hook lets the run complete and return the report with
    * `dq.passed == false` for callers that gate downstream themselves — but
    * the success watermark is NOT advanced for such a run, so etl_state
    * never records a DQ-failed run as successful. */
  def run(spark: SparkSession, fetcher: PageFetcher, cfg: PipelineConfig,
          onDqFailure: DqReport => Unit = FailOnDq): PipelineReport = {
    val stateRepo = new StateRepo(spark, cfg.stateDir)
    val client = new ODataClient(cfg.baseUrl, fetcher, Some(stateRepo), cfg.skipRequestErrors)

    // --- extract (reference dag:93-129) -----------------------------------
    val rawInd = client.getAllData("Indicator", "who_indicators", None, cfg.pageSize)
    val rawCty = client.getAllData("DIMENSION/COUNTRY/DimensionValues",
      "who_countries", None, cfg.pageSize)
    // indicator list: config or fallback to all extracted (dag:110-113)
    val indicatorCodes =
      if (cfg.indicatorCodes.nonEmpty) cfg.indicatorCodes
      else rawInd.flatMap(_.get("IndicatorCode")).filter(_ != null).distinct
    // drop countries with a falsy Code (dag:113-117)
    val countryCodes = rawCty
      .flatMap(r => Option(r.getOrElse("Code", null)))
      .filter(_.nonEmpty)
    // observations: parallel DSv2 scan when a factory is configured, else
    // the sequential (checkpoint-resumable) driver-side client
    val (obsRawDf, nObsExtracted) = cfg.fetcherFactoryClass match {
      case Some(factory) =>
        val df = observationFrame(spark, cfg, factory, indicatorCodes, countryCodes)
        // pin the extract: each downstream action would otherwise re-fetch
        // the API (a DSv2 scan is lazy and re-runs per action)
        val pinned = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = pinned.count().toInt
        // the extract is pinned: this run no longer needs the per-partition
        // resume records, and a FUTURE run must refetch fresh data rather
        // than replay today's (the sequential path clears its checkpoint on
        // success for the same reason)
        graft.util.Fs.deleteRecursively(dsv2ResumeDir(cfg),
          spark.sparkContext.hadoopConfiguration)
        (pinned, n)
      case None =>
        val rawObs = ODataClient.fetchObservations(client, indicatorCodes,
          countryCodes, cfg.devRunLimit, cfg.pageSize)
        (ODataClient.toDataFrame(spark, rawObs, Schemas.rawObservation), rawObs.size)
    }

    // --- stage as DataFrames ---------------------------------------------
    // Optionally round-trip through JSON stage files (S6/S7): written raw,
    // re-read with the explicit permissive schema — absent fields become
    // NULL (the ensure-columns contract) and PERMISSIVE mode sends corrupt
    // lines to the dead letter instead of failing the job.
    // The re-read schema is the STAGED frame's schema (declared columns
    // plus any extras the API returned), not just the declared base — EP1
    // and EP2 must keep identical column sets (extra observation columns
    // survive; SURVEY.md gotcha #4).
    def staged(df: org.apache.spark.sql.DataFrame, name: String) =
      cfg.stageDir match {
        case Some(stage) =>
          df.write.mode("overwrite").json(s"$stage/$name")
          spark.read.schema(df.schema).option("mode", "PERMISSIVE")
            .json(s"$stage/$name")
        case None => df
      }
    val indDf = staged(ODataClient.toDataFrame(spark, rawInd, Schemas.rawIndicator),
      "indicators_raw")
    val ctyDf = staged(ODataClient.toDataFrame(spark, rawCty, Schemas.rawCountry),
      "countries_raw")
    val obsDf = staged(obsRawDf, "observations_raw")

    // --- transform + validate (dag:133-165) -------------------------------
    val (indicators, indRej) = ValidateWho.validateIndicators(Transform.transformIndicators(indDf))
    val (countries, ctyRej) = ValidateWho.validateCountries(Transform.transformCountries(ctyDf))
    val (observations, obsRej) = ValidateWho.validateObservations(Transform.transformObservations(obsDf))

    // --- load: DDL + migration check, then keyed upsert per table
    // (dag:168-187, etl/load.py:17-52) -------------------------------------
    cfg.jdbcWarehouse match {
      case Some(wh) =>
        // the reference's destination shape: each table upserted through
        // the staging-write + one-transaction merge sink
        def stringTypes(df: org.apache.spark.sql.DataFrame): Map[String, String] = {
          val decl = df.schema.fields
            .collect { case f if f.dataType == org.apache.spark.sql.types.StringType =>
              s"${f.name} ${wh.stringType}" }
          if (decl.isEmpty) Map.empty
          else Map("createTableColumnTypes" -> decl.mkString(", "))
        }
        def up(df: org.apache.spark.sql.DataFrame, table: String, keys: Seq[String]): Unit =
          graft.operators.JdbcUpsert.upsert(df, wh.url, table, keys,
            dialect = wh.dialect, props = wh.props, stagingOptions = stringTypes(df))
        up(indicators.toDF(), "dim_indicator", Seq("indicator_code"))
        up(countries.toDF(), "dim_country", Seq("country_code"))
        up(observations.toDF(), "fact_observation", Seq("observation_id"))
      case None =>
        Warehouse.createSchema(spark, cfg.warehouseDir)
        // dims: tiny keyed tables → simple whole-table upsert.
        Upsert.upsertTable(spark, s"${cfg.warehouseDir}/dim_indicator",
          indicators.toDF(), Seq("indicator_code"), Seq(col("indicator_code")))
        Upsert.upsertTable(spark, s"${cfg.warehouseDir}/dim_country",
          countries.toDF(), Seq("country_code"), Seq(col("country_code")))
        // fact: the table that is 100 TB at scale → hash-bucket-partitioned
        // layout; an incremental batch rewrites only the buckets it touches.
        Upsert.upsertPartitionedTable(spark, s"${cfg.warehouseDir}/fact_observation",
          observations.toDF(), Seq("observation_id"), Seq(col("observation_id")),
          numBuckets = cfg.factBuckets)
    }

    // --- dead letter: always persisted (etl/load.py:55-71) ----------------
    val rejects = indRej.unionByName(ctyRej).unionByName(obsRej)
    val nRejected = rejects.count()
    if (nRejected > 0) cfg.jdbcWarehouse match {
      case Some(wh) =>
        rejects.write.mode("append").jdbc(wh.url, "rejected_record", wh.props)
      case None =>
        rejects.write.mode("append").parquet(s"${cfg.warehouseDir}/rejected_record")
    }

    // --- DQ gates over the *loaded* table (dag:189-206), one pass ---------
    def loadedTable(jdbcName: String, parquetRead: => org.apache.spark.sql.DataFrame) =
      cfg.jdbcWarehouse match {
        case Some(wh) => spark.read.jdbc(wh.url, jdbcName, wh.props)
        case None => parquetRead
      }
    // explicit schema: a zero-observation batch leaves an empty bucketed
    // table, which must reach the COUNT gate as an empty frame — not die
    // in schema inference before the gate can fail (round-17, surfaced by
    // the DQ-hook spec)
    val fact = loadedTable("fact_observation",
      Upsert.readPartitionedTable(spark, s"${cfg.warehouseDir}/fact_observation",
        schema = Some(observations.toDF().schema)))
    val dqRow = fact.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.when(col("indicator_code").isNull ||
            col("spatial_dim").isNull || col("time_dim").isNull, 1L).otherwise(0L)),
        org.apache.spark.sql.functions.lit(0L))).head()
    val dq = DqReport(factRowCount = dqRow.getLong(0), nullKeyCount = dqRow.getLong(1))

    // --- DQ-failure notification seam (dag:36-39 email_on_failure analog);
    // fires before the watermark, and a failed run NEVER advances it — even
    // with a non-throwing hook, etl_state must not record the run as
    // successful (the reference's failed task blocks the whole DAG run) ----
    if (!dq.passed) onDqFailure(dq)

    // --- watermark (etl/state.py:39-55; wired here, unlike the reference) --
    // advance only on a passing run: a non-throwing onDqFailure hook returns
    // control here, and the failed run must stay invisible to the watermark
    if (dq.passed) {
      stateRepo.setLastSuccessfulRunAt("who_gho_etl",
        new java.sql.Timestamp(System.currentTimeMillis()))
    }

    obsRawDf.unpersist()
    PipelineReport(
      observationsExtracted = nObsExtracted,
      indicatorsExtracted = rawInd.size,
      countriesExtracted = rawCty.size,
      indicatorsLoaded = loadedTable("dim_indicator",
        spark.read.parquet(s"${cfg.warehouseDir}/dim_indicator")).count(),
      countriesLoaded = loadedTable("dim_country",
        spark.read.parquet(s"${cfg.warehouseDir}/dim_country")).count(),
      observationsLoaded = dq.factRowCount,
      rejectedRecords = nRejected,
      dq = dq)
  }
}
