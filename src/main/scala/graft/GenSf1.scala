package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 generator: a 10× scale-up of the driver's sf0.1
  * tables (≈6M lineitem / 1.5M orders / 1M events / 50k documents / 20k
  * embeddings) for the sf1 same-window bench pair the round-11 verdict
  * asks for. The driver's own generator is not available, so sf1 derives
  * from sf0.1 by replication with key shifts — shaped to preserve what
  * each query family measures:
  *
  *  - **Star schema**: replicas r=0..9 shift every key by `r × stride`
  *    (strides far above the sf0.1 key ranges), consistently across
  *    lineitem/orders/customer/supplier/part — referential integrity and
  *    per-key uniqueness hold exactly, so joins, dedup tiebreaks and
  *    top-1 queries stay total-ordered. region/nation are fixed dims
  *    (the 100 TB shape: q92's graph stays 25 nodes under a 10× fact).
  *  - **events**: replicas shift event_id/user_id; timestamps unchanged
  *    (windows keep their span, per-window volume grows 10× — the
  *    streaming/sessionization scale axis). Written as TIMESTAMP_NTZ to
  *    mirror the driver data's naive-timestamp storage through the
  *    Tables.scala ingest seam.
  *  - **documents**: replica 0 is the original corpus; replicas 1..9
  *    SUFFIX every token with a replica tag (`the` → `thezz3`) — a
  *    bijective vocabulary rename. Within a replica the duplicate-family
  *    structure (shared tokens, shingles, fingerprints) is EXACTLY the
  *    original, so dedup sees 10× the families at the original sizes =
  *    constant duplication density; across replicas the vocabularies are
  *    disjoint, so no cross-replica candidate pairs exist — replication
  *    cannot inflate pair counts quadratically (the SCALE_r11 lesson:
  *    real corpora grow mostly-unique; whole-corpus cloning makes true
  *    pair counts O(k²) in the data itself and benchmarks the explosion,
  *    not the engine). A shared per-replica MARKER token was tried first
  *    and rejected: one token holding 25% of every doc's mass collapses
  *    the replica's simhash fingerprints into one Hamming ball —
  *    26.6M q21 pairs from a generator artifact, not the data.
  *  - **embeddings**: replica 0 original (including the vec_id=0 probe);
  *    replicas 1..9 are FRESH hash-derived Box–Muller gaussians, not
  *    perturbed copies — perturbed copies would hand every ANN query 10
  *    planted near-duplicates per base vector and quietly turn the
  *    isotropic (hard) retrieval problem into a clustered (easy) one.
  *
  * `runMain graft.GenSf1 [srcDir] [dstDir]` — defaults sf0.1 →
  * `target/sf1`. Idempotent overwrite; ~150 MB on disk. */
object GenSf1 {
  val Reps = 10

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.drop(1).headOption.getOrElse("target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // key strides: far above every sf0.1 key range, so shifted key spaces
    // never collide and original-key arithmetic (q112's id-derived media,
    // q104's hash splits, ...) keeps producing distinct values per replica
    val OK = 10000000L // orders (max o_orderkey ~600k at sf0.1)
    val CK = 1000000L  // customer
    val SK = 1000000L  // supplier
    val PK = 1000000L  // part
    val EK = 10000000L // events
    val UK = 1000000L  // users
    val DK = 1000000L  // documents
    val VK = 1000000L  // embeddings

    def reps: DataFrame = spark.range(Reps).select(col("id").as("rep"))
    def t(name: String): DataFrame = Tables.load(spark, src, name)
    // single FILE per table, like the driver's data (DuckDB's
    // read_parquet and Tables.loadStream's glob both expect files, not
    // Spark part-file directories): write coalesced, then promote the one
    // part file to `<name>.parquet`
    def write(name: String, df: DataFrame): Unit = {
      val tmp = s"$dst/_tmp_$name"
      // Small row groups: a coalesce(1) file with the default 128 MB block
      // size is ONE row group — unsplittable, so every sf1 scan (Spark's
      // FileSourceScan partitions AND DuckDB's row-group parallelism)
      // serialized onto a single thread. A real 100 TB table is thousands
      // of splits; the bench data must not accidentally measure
      // single-threaded scans. 8 MB ≈ 10 groups for the 80 MB lineitem;
      // documents/embeddings are only ~6 MB on disk but carry the highest
      // CPU-per-byte work on the board (shingling, regex, per-row codecs),
      // so they get 1 MB groups to stay splittable too.
      val blockSize =
        if (name == "documents" || name == "embeddings") 1 * 1024 * 1024
        else 8 * 1024 * 1024
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", blockSize)
        .parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val target = new org.apache.hadoop.fs.Path(s"$dst/$name.parquet")
      if (fs.exists(target)) fs.delete(target, true): Unit
      if (!fs.rename(part, target)) sys.error(s"rename failed for $name")
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true): Unit
      val n = spark.read.parquet(s"$dst/$name.parquet").count()
      println(s"[gensf1] $name: $n rows")
    }

    // fixed dims, copied verbatim
    write("region", t("region"))
    write("nation", t("nation"))

    def shifted(name: String, shifts: Map[String, Long]): DataFrame = {
      val base = t(name).crossJoin(reps)
      val out = shifts.foldLeft(base) { case (df, (c, stride)) =>
        df.withColumn(c, col(c) + col("rep") * stride)
      }
      out.drop("rep")
    }

    write("customer", shifted("customer", Map("c_custkey" -> CK)))
    write("supplier", shifted("supplier", Map("s_suppkey" -> SK)))
    write("part", shifted("part", Map("p_partkey" -> PK)))
    write("orders", shifted("orders", Map("o_orderkey" -> OK, "o_custkey" -> CK)))
    write("lineitem", shifted("lineitem",
      Map("l_orderkey" -> OK, "l_partkey" -> PK, "l_suppkey" -> SK)))

    // events: naive-timestamp storage preserved (TIMESTAMP_NTZ), so the
    // sf1 dir exercises the same NTZ ingest seam the driver data does
    write("events", shifted("events", Map("event_id" -> EK, "user_id" -> UK))
      .withColumn("ts", col("ts").cast("timestamp_ntz")))

    // documents: replica 0 verbatim; replicas 1..9 with the per-token
    // replica suffix (see scaladoc). n_chars re-derived from the new text.
    val docs = t("documents")
    // The replica suffixing below splits on a literal single space while
    // the engine tokenizes on \s+ — if the source corpus ever contained
    // tabs/newlines/runs of spaces (or leading/trailing whitespace), some
    // tokens would escape suffixing (or empty pieces would become bare
    // "zzN" tokens), silently breaking the cross-replica vocabulary
    // disjointness the scheme depends on. Assert the precondition loudly
    // instead of relying on it (advisor, r12).
    val nBadWs = docs.filter(col("text").rlike("^\\s|\\s$|\\s\\s|[^\\S ]")).count()
    require(nBadWs == 0,
      s"documents.text has $nBadWs rows with non-single-space whitespace; " +
        "the per-token replica suffixing would miss tokens — fix the split " +
        "(regexp-based, \\s+ semantics) before replicating this corpus")
    val docReps = docs.crossJoin(reps.filter(col("rep") =!= 0))
      .withColumn("doc_id", col("doc_id") + col("rep") * DK)
      .withColumn("text", array_join(
        transform(split(col("text"), " "), tok =>
          concat(tok, lit("zz"), col("rep").cast("string"))), " "))
      .withColumn("n_chars", length(col("text")))
      .drop("rep")
    write("documents", docs.unionByName(docReps))

    // embeddings: replica 0 verbatim; replicas 1..9 fresh deterministic
    // gaussians — Box–Muller over two murmur3-hash-derived uniforms per
    // (vec_id, rep, dim). Label re-derived from the hash so it stays a
    // balanced int channel.
    val emb = t("embeddings")
    def unif(salt: Int) = (pmod(hash(col("vec_id"), col("rep"), col("d"), lit(salt)),
      lit(1000000)).cast("double") + lit(0.5)) / lit(1000000.0)
    val embReps = emb.select(col("vec_id")).crossJoin(reps.filter(col("rep") =!= 0))
      .withColumn("vec_id", col("vec_id") + col("rep") * VK)
      .select(col("vec_id"), col("rep"),
        explode(sequence(lit(0), lit(63))).as("d"))
      .withColumn("g",
        sqrt(lit(-2.0) * log(unif(17))) * cos(lit(2.0 * math.Pi) * unif(31)))
      .groupBy(col("vec_id"), col("rep"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("g")))),
        s => s.getField("g").cast("float")).as("embedding"))
      .withColumn("label", pmod(hash(col("vec_id"), lit(7)), lit(2)).cast("int"))
      .drop("rep")
    write("embeddings", emb.unionByName(embReps))

    println(s"[gensf1] wrote $dst")
    spark.stop()
  }
}
