package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Manual scale probe (not part of the driver contract): replicates the
  * sf0.1 corpus ~20× with light tail mutations — every replica group is a
  * genuine near-dup cluster — and runs the dedup family at ~100k docs to
  * observe scaling behavior (candidate counts, wall time, no OOM).
  *
  * `runMain graft.ScaleStress [replication]` */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val docs = base
      .crossJoin(spark.range(rep).select(col("id").as("rep")))
      .select(
        (col("doc_id") * rep + col("rep")).as("doc_id"),
        // mutate the tail so replicas are near-dups, not exact dups
        concat(col("text"), lit(" tail"), col("rep")).as("text"))
      .repartition(32)
    println(s"[stress] corpus: ${docs.count()} docs (base $n x $rep)")

    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s → $r")
    }
    time("exactGroups")(TextDedup.exactGroups(docs).count())
    time("winnowFingerprints")(TextDedup.winnowFingerprints(docs).count())
    time("minhashLshGroups")(TextDedup.minhashLshGroups(docs).count())
    time("minhashLshPairs")(TextDedup.minhashLshPairs(docs).count())
    time("simhashPairs")(TextDedup.simhashPairs(docs).count())
    spark.stop()
  }
}
