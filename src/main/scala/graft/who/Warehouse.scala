package graft.who

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Idempotent warehouse DDL + the reference's one schema-migration rule
  * (`create_schema`, reference etl/load.py:17-27): create all tables when
  * absent; if a legacy `fact_observation` exists WITHOUT the
  * `observation_id` column, drop and recreate it.
  *
  * Tables are parquet directories; "create" materializes an empty frame with
  * the canonical schema so downstream readers never hit missing-path errors
  * and schema drift is detectable by comparison. */
object Warehouse {

  val dimIndicator: StructType = StructType(Seq(
    StructField("indicator_code", StringType, nullable = false),
    StructField("indicator_name", StringType, nullable = false),
    StructField("language", StringType, nullable = false)))

  val dimCountry: StructType = StructType(Seq(
    StructField("country_code", StringType, nullable = false),
    StructField("country_name", StringType, nullable = false)))

  val factObservation: StructType = StructType(Seq(
    StructField("observation_id", LongType, nullable = false),
    StructField("indicator_code", StringType, nullable = false),
    StructField("spatial_dim", StringType, nullable = false),
    StructField("spatial_dim_type", StringType, nullable = false),
    StructField("time_dim", IntegerType, nullable = false),
    StructField("time_dim_type", StringType, nullable = false),
    StructField("numeric_value", DoubleType, nullable = true),
    StructField("value", StringType, nullable = true)))

  val rejectedRecord: StructType = StructType(Seq(
    StructField("record_data", StringType, nullable = false),
    StructField("error_details", StringType, nullable = false)))

  val tables: Map[String, StructType] = Map(
    "dim_indicator" -> dimIndicator,
    "dim_country" -> dimCountry,
    "fact_observation" -> factObservation,
    "rejected_record" -> rejectedRecord)

  /** reference create_schema: idempotent create + the migration rule.
    * Existence/listing/delete via the Hadoop FileSystem API so the warehouse
    * lives on any scheme Spark can reach (file://, hdfs://, s3a://). */
  def createSchema(spark: SparkSession, warehouseDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def exists(path: String): Boolean = graft.util.Fs.nonEmptyDir(path, conf)
    val factPath = s"$warehouseDir/fact_observation"
    if (exists(factPath)) {
      val current = spark.read.parquet(factPath).schema
      if (!current.fieldNames.contains("observation_id")) {
        // legacy schema — drop + recreate (reference etl/load.py:20-24)
        graft.util.Fs.deleteRecursively(factPath, conf)
      }
    }
    tables.foreach { case (name, schema) =>
      val path = s"$warehouseDir/$name"
      if (!exists(path)) {
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
          .write.mode(SaveMode.Overwrite).parquet(path)
      }
    }
  }

  def readTable(spark: SparkSession, warehouseDir: String, name: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$name")
}
