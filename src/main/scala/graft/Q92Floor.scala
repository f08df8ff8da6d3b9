package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** q92 floor decomposition (round-8 verdict ask): measures where the
  * PageRank query's wall time actually goes at sf0.1, so the spark-vs-duck
  * ratio on a 25-vertex graph can be judged against the irreducible
  * per-action scheduling floor of a distributed runtime rather than read
  * as a plan defect. Phases:
  *
  *  - `action_floor`: median latency of a trivially small job (count over
  *    a 25-row range) — the fixed cost ANY driver action pays at local
  *    scale (scheduling, stage setup, result fetch);
  *  - `derivation`: the real distributed work — the three-join
  *    lineitem⋈orders⋈customer⋈supplier edge derivation + distinct,
  *    counted once warm;
  *  - `loop_only`: Graph.pagerank on the PRE-MATERIALIZED (localCheckpoint)
  *    edge list — isolates the rank loop + its unavoidable actions;
  *  - `full`: the declared q92 end-to-end.
  *
  * Emits one JSON line and writes `target/q92_floor.json` (committed per
  * round as the floor-decomposition artifact).
  *
  * `runMain graft.Q92Floor [sfDir]` */
object Q92Floor {
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
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warm-up

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def timedMedian(passes: Int)(f: => Unit): Double = {
      time(f) // warm-up, untimed
      med(Seq.fill(passes)(time(f)))
    }

    val actionFloor = timedMedian(5)(spark.range(25).count())

    def derive() = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, sfDir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .distinct()
    val vertices = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey").as("id"))

    val derivation = timedMedian(3)(derive().count())

    // pre-materialized edge list → the loop's own cost, derivation excluded
    val edgesLeaf = derive().localCheckpoint(true)
    val loopOnly = timedMedian(3) {
      Graph.pagerank(vertices, edgesLeaf, iterations = 5).count()
      spark.catalog.clearCache()
    }

    val full = timedMedian(3) {
      SparkEntry.queries("q92_pagerank")(spark, sfDir).count()
      spark.catalog.clearCache()
    }

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", v)
    val json = s"""{"action_floor":${num(actionFloor)}""" +
      s""","derivation":${num(derivation)},"loop_only":${num(loopOnly)}""" +
      s""","full":${num(full)},"pr_iters":5,"sf":"$sfDir"}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/q92_floor.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
