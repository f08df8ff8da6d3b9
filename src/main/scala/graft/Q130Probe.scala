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
    // warm the scan
    time("scan_count")(docs.count())
    for (i <- 1 to 3) {
      time(s"tokenize_split_$i") {
        docs.select(size(filter(graft.functions.TextFunctions.tokens(col("text")),
          t => t =!= "")).as("n")).agg(sum("n")).head()
      }
      time(s"tokenize_kernel_$i") {
        docs.select(size(filter(graft.functions.TextFunctions.tokensFast(col("text")),
          t => t =!= "")).as("n")).agg(sum("n")).head()
      }
    }
    val ent = graft.operators.BpeCodec.termFrequencyEntries(docs)
    time("rle_entries_sum") {
      ent.select(size(col("tfs")).as("n")).agg(sum("n")).head()
    }
    val ent2 = graft.operators.BpeCodec.termFrequencyEntries(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("persist_entries") { ent2.count() }
    val tf = graft.operators.BpeCodec.flatTf(ent2)
    val dict = tf.groupBy("w").agg(sum("tf").as("cnt"))
    time("dict_from_cache") { dict.count() }
    val table = time("table_build") {
      graft.operators.BpeCodec.frequencyMergeTableFromDict(dict, 2, 1)
    }
    time("encode_from_cache") {
      graft.operators.BpeCodec.encodeFromTf(tf, table).write
        .mode("overwrite").parquet("/tmp/q130probe")
    }
    // full query end to end, fresh (matches bench shape)
    spark.catalog.clearCache()
    time("full_query") {
      Queries.all("q130_bpe_encode_prefix")(spark, dir).write
        .mode("overwrite").parquet("/tmp/q130probe2")
    }
    spark.stop()
  }
}
