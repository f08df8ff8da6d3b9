package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** (nCentroids, nProbe) sweep for the IVF index — the measurement behind
  * the declared q36 config. Publishes, per config: mean recall@10 over
  * the same 20 query vectors Bench's `q36_mean20_recall_at_10` uses, and
  * the measured scan fraction (rows in probed cells / corpus rows,
  * averaged over the 20 probes — the COST side; recall without scan
  * fraction is half a number, brute force has recall 1.0).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IvfSweep"
  * One JSON line per config on stdout. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-ivf-sweep").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val corpus = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"))
      val nCorpus = corpus.count().toDouble
      val configs: Seq[(Int, Int)] = args.toSeq match {
        case Seq() => Seq((16, 4), (32, 8), (48, 12), (64, 12), (64, 16), (96, 24))
        case xs => xs.map { s => val Array(a, b) = s.split('/'); (a.toInt, b.toInt) }
      }
      configs.foreach { case (nc, np) =>
        val ivf = Similarity.Ivf(nCentroids = nc, nProbe = np, exact = true)
        val (centers, index0) = ivf.build(corpus)
        val index = index0.persist()
        index.count()
        val cellSizes = index.groupBy("centroid_id").count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val (recalls, fracs) = (1L to 20L).map { qid =>
          val qDf = emb.filter(col("vec_id") === qid)
            .select(col("embedding").as("qv"))
          val truth = Similarity.bruteForceTopK(
              corpus.filter(col("vec_id") =!= qid), qDf, 10)
            .collect().map(_.getLong(0)).toSet
          val found = ivf.topK(centers, index.filter(col("vec_id") =!= qid), qDf, 10)
            .collect().map(_.getLong(0)).toSet
          // probe selection mirrors Ivf.topK so the fraction is the real cost
          val qv = qDf.head().getSeq[Any](0)
            .map { case f: Float => f.toDouble; case d: Double => d }.toArray
          val qn = math.sqrt(qv.map(x => x * x).sum)
          val nq = qv.map(_ / qn)
          val probes = centers.zipWithIndex
            .map { case (c, i) => (i, c.zip(nq).map { case (a, b) => a * b }.sum) }
            .sortBy(-_._2).take(np).map(_._1)
          val scanned = probes.map(p => cellSizes.getOrElse(p, 0L)).sum
          (found.intersect(truth).size / 10.0, scanned / nCorpus)
        }.unzip
        index.unpersist()
        println(f"""{"n_centroids":$nc,"n_probe":$np,""" +
          f""""mean20_recall_at_10":${recalls.sum / 20.0}%.3f,""" +
          f""""mean_scan_frac":${fracs.sum / 20.0}%.3f,"sf_dir":"$sfDir"}""")
      }
    } finally spark.stop()
  }
}
