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

    // round-5 curation operators at the same corpus size
    import graft.operators.{Packing, Sampling, TextClean}
    time("hashSample 30%")(
      Sampling.hashSample(docs, col("doc_id"), 0.3).count())
    time("stratifiedQuota 1k/stratum")(
      Sampling.stratifiedQuota(docs.withColumn("s", col("doc_id") % 16),
        col("s"), col("doc_id"), 1000).count())
    time("packChunked")(
      Packing.packChunked(docs.withColumn("s", col("doc_id") % 16),
        col("doc_id"), size(split(trim(col("text")), "\\s+")), 2048,
        Seq(col("s"))).count())
    time("packNextFit")(
      Packing.packNextFit(
        docs.withColumn("s", col("doc_id") % 16)
          .withColumn("n", size(split(trim(col("text")), "\\s+"))),
        "doc_id", "n", 2048, Seq("s")).count())
    time("scrubPii")(
      TextClean.scrubPii(docs, col("text"))
        .agg(sum(col("n_emails") + col("n_urls") + col("n_phones"))).head().get(0))

    // round-6 term weighting at the same corpus size (~100k docs, ~20M
    // tokens): the single-exchange TF-IDF shape and the fixed-memory
    // Misra–Gries sketch vs the exact count
    import graft.operators.TermWeighting
    import graft.plans.ApproxTopK
    time("tfidfTopTerms")(
      TermWeighting.tfidfTopTerms(docs, topK = 5).count())
    time("heavyHitters exact top-25")(
      TermWeighting.heavyHitters(docs, k = 25).count())
    ApproxTopK.register(spark)
    time("graft_approx_topk k=100 (sketch, no per-term shuffle)")(
      docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
        .agg(ApproxTopK.of(col("term"), 100)).head().getSeq[Any](0).size)

    // MERGE at fact-table scale: 600k-row base, 10k-row three-clause batch
    // against the bucketed layout (I/O bounded by touched buckets)
    val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val layout = java.nio.file.Files.createTempDirectory("stress-merge").toString + "/t"
    import graft.operators.{Merge, Upsert}
    time("upsertPartitionedTable build")(
      Upsert.upsertPartitionedTable(spark, layout, orders,
        Seq("o_orderkey"), Seq(col("o_orderkey")), numBuckets = 64))
    val batch = orders.filter(col("o_orderkey") % 15 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
    time(s"mergePartitionedTable (${batch.count()} keys)")(
      Merge.mergePartitionedTable(spark, layout, batch, Seq("o_orderkey"),
        matched = Seq(Merge.MatchedUpdate(Map(
          "o_totalprice" -> Merge.src("o_totalprice")))),
        notMatched = Some(Merge.NotMatchedInsert()),
        sourcePriority = Seq(col("o_orderkey"))))
    time("merged table count")(
      Upsert.readPartitionedTable(spark, layout).count())
    spark.stop()
  }
}
