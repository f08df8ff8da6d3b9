package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q96 floor decomposition (the q92 pattern applied to the largest
  * remaining bench gap): measures where the streaming-upsert-sink query's
  * wall goes at sf0.1, so its ~30× ratio against a 0.1s DuckDB batch
  * MERGE can be judged against the per-RUN constants of a real streaming
  * pipeline rather than read as a plan defect. Phases:
  *
  *  - `seed_build`: distinct key derivation + the seeded bucketed-parquet
  *    table write (16 buckets) — a per-RUN setup cost;
  *  - `stream_run`: the AvailableNow micro-batch upsert stream run to
  *    termination against a PRE-BUILT seeded table (fresh checkpoint and
  *    fresh table copy per pass — the stream mutates its sink);
  *  - `final_read`: reading the completed bucketed table back;
  *  - `full`: the declared q96 end-to-end (noop-consumed like Bench).
  *
  * Writes `target/q96_floor.json` (committed as the floor-decomposition
  * artifact). `runMain graft.Q96Floor [sfDir]` */
object Q96Floor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/events.parquet").count() // session warm-up

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val keys = Seq("user_id", "event_type", "bucket")
    def batchKeys: DataFrame = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("bucket"))
      .distinct()
    def seed: DataFrame = batchKeys.withColumn("src", lit("seed"))
      .unionByName(batchKeys.filter(col("user_id") % 3 === 0)
        .withColumn("user_id", col("user_id") + lit(100000000L))
        .withColumn("src", lit("seed")))
    def freshDir(tag: String): String = graft.util.Fs.scratchDir(s"graft-q96floor-$tag").toString + "/t"

    def buildSeeded(): String = {
      val dir = freshDir("tbl")
      graft.operators.Upsert.upsertPartitionedTable(
        spark, dir, seed, keys, keys.map(col), numBuckets = 16)
      dir
    }
    def runStream(tableDir: String): Unit = {
      val ckpt = freshDir("ckpt")
      val stream = Tables.loadStream(spark, sfDir, "events")
        .select(col("user_id"), col("event_type"),
          date_trunc("minute", col("ts")).as("bucket"))
        .withColumn("src", lit("stream"))
      val q = graft.streaming.EventStreams
        .upsertStream(stream, tableDir, ckpt, keys, numBuckets = 16)
      require(q.awaitTermination(300000), "q96 floor stream did not terminate")
    }

    def timedMedian(passes: Int)(f: => Double): Double = { f; med(Seq.fill(passes)(f)) }

    val seedBuild = timedMedian(3)(time { buildSeeded() })
    val streamRun = timedMedian(3) {
      val dir = buildSeeded() // untimed fresh sink per pass
      time { runStream(dir) }
    }
    // batch twin (r17): the SAME per-batch work — projected batch →
    // upsertPartitionedTable against a fresh seeded table — without the
    // streaming machinery; stream_run − batch_twin = source tracking +
    // checkpoint + AvailableNow start/stop
    val batchTwin = timedMedian(3) {
      val dir = buildSeeded()
      time {
        val batch = Tables.load(spark, sfDir, "events")
          .select(col("user_id"), col("event_type"),
            date_trunc("minute", col("ts")).as("bucket"))
          .withColumn("src", lit("stream"))
        graft.operators.Upsert.upsertPartitionedTable(
          spark, dir, batch, keys, keys.map(col), numBuckets = 16)
      }
    }
    val finalRead = timedMedian(3) {
      val dir = buildSeeded(); runStream(dir) // untimed
      time { graft.operators.Upsert.readPartitionedTable(spark, dir)
        .write.format("noop").mode("overwrite").save() }
    }
    val full = timedMedian(3)(time {
      SparkEntry.queries("q96_stream_upsert_sink")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    })

    def n(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", v)
    val json = s"""{"seed_build":${n(seedBuild)},"stream_run":${n(streamRun)},""" +
      s""""batch_twin":${n(batchTwin)},""" +
      s""""final_read":${n(finalRead)},"full":${n(full)},""" +
      s""""note":"seed_build + stream_run + final_read are per-RUN constants of a streaming sink (table seeding, AvailableNow micro-batch machinery, bucketed layout read); none scales with data volume at fixed key cardinality. batch_twin = identical upsert run as a batch: stream_run - batch_twin is the streaming machinery (file-source tracking, checkpoint, AvailableNow start/stop)","sf":"$sfDir"}"""
    println(json)
    // sf-suffixed artifact for non-default scale factors (round-15: the
    // sf1 decomposition is a separate committed file, q96_floor_sf1.json;
    // the legacy unsuffixed name stays the sf0.1 artifact)
    val sfLabel = new java.io.File(sfDir).getName.replace(".", "")
    val out = if (sfLabel == "sf01") "target/q96_floor.json"
              else s"target/q96_floor_$sfLabel.json"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
