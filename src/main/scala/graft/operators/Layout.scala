package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers: bucketed tables for co-located joins.
  *
  * A join between two tables bucketed by the same key into the same bucket
  * count needs NO shuffle — each task reads matching buckets from both
  * sides. At 100 TB this converts the dominant cost of fact⋈fact joins
  * (a full shuffle of both sides) into a local merge per bucket; the price
  * is paid once at write time. Bucketing requires the session catalog
  * (`saveAsTable`), which works against the default in-memory catalog +
  * `spark.sql.warehouse.dir` with no Hive metastore. */
object Layout {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the co-location check for bucketed joins. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
