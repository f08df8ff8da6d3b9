package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the formatted physical plan for selected
  * queries so scan pushdown / join strategy / codegen spans can be reviewed
  * (`runMain graft.Explain [queryName ...]`). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Queries.all.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Queries.all(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
