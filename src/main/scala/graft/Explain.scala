package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation main (guide §1.4/§1.5/§7.2):
  * for each named query, prints the `.explain("formatted")` plan and runs
  * the query once against the noop sink with a job listener attached, so
  * the output shows WHERE a multi-job query spends its wall — per-job
  * durations with the job group description — alongside the plan a reader
  * can check Exchange count / join strategy / PushedFilters against.
  *
  * Usage: runMain graft.Explain <sfDir> <outDir> <q1,q2,...> [suffix]
  *   - writes <outDir>/<query>_<suffix>.txt (suffix defaults to "before")
  *   - SPARK_GRAFT_CPUS honored like Bench/Verify.
  *
  * Plans are for evidence; the timings here are single-pass (use Bench's
  * interleaved medians for citable numbers). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val suffix = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // warm the session so JIT/codegen noise doesn't drown the job profile
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    final case class JobRow(id: Int, desc: String, sec: Double, stages: Int)
    val jobs = scala.collection.mutable.ArrayBuffer[JobRow]()
    val starts = scala.collection.mutable.Map[Int, (Long, String, Int)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse(""),
          js.stageInfos.size)
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d, ns) =>
          jobs.synchronized {
            jobs += JobRow(je.jobId, d, (System.nanoTime() - t0) / 1e9, ns)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val sb = new StringBuilder
      sb ++= s"== $name @ $sfDir (${java.time.Instant.now()}) ==\n\n"
      // 1) the formatted plan of the query's final frame (pre-execution:
      //    AQE nodes show isFinalPlan=false; job profile below is what ran)
      val df = fn(spark, sfDir)
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // 2) one noop-sink execution with the job listener recording
      jobs.synchronized(jobs.clear())
      spark.sparkContext.setJobDescription(s"$name noop run")
      val t0 = System.nanoTime()
      // rebuild the frame so queries with internal actions (training loops,
      // streams) profile their full body, not just the final projection
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      sb ++= f"\n\n== job profile (single pass, wall ${wall}%.3f s) ==\n"
      val snapshot = jobs.synchronized(jobs.toVector).sortBy(_.id)
      snapshot.foreach { j =>
        sb ++= f"job ${j.id}%4d  ${j.sec}%8.3f s  stages=${j.stages}%3d  ${j.desc}\n"
      }
      sb ++= f"sum of jobs: ${snapshot.map(_.sec).sum}%.3f s over ${snapshot.size} jobs\n"
      spark.catalog.clearCache()
      val path = java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt")
      java.nio.file.Files.write(path,
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[explain] wrote $path")
    }
    spark.stop()
  }
}
