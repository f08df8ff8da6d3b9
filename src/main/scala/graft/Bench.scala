package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM JIT, codegen pipeline, FS metadata) so per-query
    // timings reflect steady-state execution rather than first-query startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // min of two timed passes per query: the environment is a shared VM
    // with visible noisy-neighbor variance, and min-of-N is the standard
    // steady-state estimator under external interference.
    def timeOnce(name: String,
                 fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches a query may have pinned (outside its timing) so later
      // queries aren't measured under accumulated heap pressure
      spark.catalog.clearCache()
      // a failed run must not masquerade as a fast timing: report -1
      if (ok) dt else -1.0
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val (a, b) = (timeOnce(name, fn), timeOnce(name, fn))
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
