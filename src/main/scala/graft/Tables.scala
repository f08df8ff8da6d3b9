package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes a scale-factor directory and
  * reads the parquet tables it needs from there, so the same query runs
  * unchanged at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, on a
  * real cluster, against a 100 TB lake path. Reads are plain
  * `spark.read.parquet`, so Catalyst gets full predicate pushdown / column
  * pruning / partition coalescing on the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    normalizeNanoTimestamps(df)
  }

  /** Streaming read of a testdata table — same path and nano-ts
    * normalization as [[load]], no staging copy: the table directory IS the
    * file-stream source (the schema comes from a driver-side footer read). */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/$name.parquet").schema
    // the testdata tables are single FILES and a file-stream source wants a
    // directory: monitor the parent, globbed down to this one table
    normalizeNanoTimestamps(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$name.parquet")
        .parquet(dir))
  }

  /** Normalizes timestamp storage shapes a real lake throws at the engine so
    * every downstream operator sees a plain `TimestampType`:
    *
    *   - TIMESTAMP(NANOS), which Spark's TimestampType (microseconds) cannot
    *     represent: sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    *     so the column arrives as LongType nanos, rewritten here to a proper
    *     timestamp (the testdata carries only microsecond precision, so the
    *     conversion is lossless).
    *   - TIMESTAMP(isAdjustedToUTC=false), i.e. naive/wall-clock timestamps,
    *     which Spark 4 infers as `TIMESTAMP_NTZ`. Event-time operators reject
    *     NTZ (`withWatermark`, `unix_millis`, ...), so cast to TimestampType.
    *     Every entry point pins the session timezone to UTC, making the cast
    *     wall-clock-preserving — values (and DuckDB-oracle hashes) unchanged.
    *
    * Applied by both [[load]] and [[loadStream]], so neither batch plans nor
    * the file-stream source ever surface an NTZ or raw-long event-time column. */
  private def normalizeNanoTimestamps(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        acc.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case (acc, f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        acc.withColumn(f.name,
          org.apache.spark.sql.functions.col(f.name).cast(org.apache.spark.sql.types.TimestampType))
      case (acc, _) => acc
    }

  /** Register tables as temp views so `spark.sql` queries resolve — mirrors
    * the reference's analytics surface where loaded tables are queried by
    * name (reference README.md:137-161). Pass only the tables the query
    * touches: each registration costs a file listing + footer read. */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, names: _*)
}
