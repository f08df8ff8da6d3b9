package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 probe for the q78 dense-bucket escalation: measures the sf1
  * sign-LSH bucket-size distribution (is [[Similarity.DefaultDenseBucketCap]]
  * really above every organic bucket?) and asserts semanticDedupGroups is
  * OUTPUT-IDENTICAL with the cap on vs off at sf1, with both walls printed.
  * Lives in `graft.operators` for access to the private banding helpers. */
object Q78Probe {
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
      println(f"[q78probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = graft.Tables.load(spark, dir, "embeddings")

    val capOff = time("groups_cap_off") {
      val df = Similarity.semanticDedupGroups(emb, 0.3, denseBucketCap = 0)
      df.persist(); df.count(); df
    }
    val capOn = time("groups_cap_on") {
      val df = Similarity.semanticDedupGroups(emb, 0.3)
      df.persist(); df.count(); df
    }
    val diff = capOff.exceptAll(capOn).count() + capOn.exceptAll(capOff).count()
    println(s"[q78probe] cap_on_vs_off_row_diff=$diff")

    // bucket histogram: top sizes under the 2x8-bit banding
    val sig = Similarity.signBitsForProbe(emb, nBits = 16)
    val top = sig.groupBy("band", "key").count()
      .orderBy(col("count").desc).limit(10).collect()
    top.foreach(r => println(s"[q78probe] bucket band=${r.get(0)} key=${r.get(1)} size=${r.get(2)}"))
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
