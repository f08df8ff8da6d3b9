package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary stage-decomposition probe for q130 (round-16 tuning). */
object Q130Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    graft.plans.Tokenize.register(spark)
    println(s"[probe] docs_partitions: ${docs.rdd.getNumPartitions}")
    time("scan_count")(docs.count())

    val dict = graft.operators.BpeCodec.wordCounts(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = time("dict_build_persist") { dict.count() }
    println(s"[probe] vocab_size: $n")
    val table = time("table_build_from_cache") {
      graft.operators.BpeCodec.frequencyMergeTableFromDict(dict, 2, 1)
    }
    val stats = time("stats_construct_incl_vocab_collect") {
      graft.operators.BpeCodec.encodeStatsFromDocs(docs, dict, table)
    }
    time("stats_write") {
      stats.write.mode("overwrite").parquet("/tmp/q130probe")
    }
    spark.catalog.clearCache()
    time("full_query") {
      Queries.all("q130_bpe_encode_prefix")(spark, dir).write
        .mode("overwrite").parquet("/tmp/q130probe2")
    }
    time("full_query_2") {
      spark.catalog.clearCache()
      Queries.all("q130_bpe_encode_prefix")(spark, dir).write
        .mode("overwrite").parquet("/tmp/q130probe2")
    }
    time("full_q129") {
      spark.catalog.clearCache()
      Queries.all("q129_bpe_encode_vocab")(spark, dir).write
        .mode("overwrite").parquet("/tmp/q130probe3")
    }
    spark.stop()
  }
}
