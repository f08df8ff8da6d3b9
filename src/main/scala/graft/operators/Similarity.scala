package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.TextFunctions.hash60
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, deliberately:
  *  - **Brute force** (`bruteForceTopK`): exact; one broadcast of the query
  *    vector and a full scan with a codegen'd cosine — the right plan up to
  *    ~10⁸ vectors per query batch, and the correctness baseline for
  *    everything else.
  *  - **Sign-LSH buckets** (`SignLsh`): the scale path — `nBits` random
  *    hyperplanes (deterministically derived from the portable hash, no RNG
  *    state to ship) map each vector to a bucket id; candidate retrieval
  *    probes the query's bucket and its Hamming-≤1 neighbors, then re-scores
  *    exactly. The index is just a column — it survives as parquet, it
  *    partitions/buckets by `bucket`, and lookup is a partition-pruned scan
  *    instead of a full sweep. Same shape as an IVF index with hyperplane
  *    cells.
  */
object Similarity {

  /** Ceiling on the query-frame row count the broadcast-scoring miners
    * ([[hardNegatives]], [[marginMining]]) accept: their compute is
    * O(|corpus| × |queries|) with the query frame broadcast whole, which
    * is only the right plan while the query side stays model-batch-sized.
    * The guard turns a silently quadratic call into a loud error pointing
    * at the ANN-probe path. 10k queries × a wide corpus row is also near
    * the comfortable broadcast envelope (~tens of MB at 128-dim). */
  val MaxBroadcastQueries = 10000

  /** Default [[cosineNearDupPairs]] dense-bucket escalation cap for
    * CONNECTIVITY callers ([[semanticDedupGroups]]): comfortably above
    * every organic band-bucket size measured on the bench corpora (sf1's
    * largest sign-LSH bucket is well under this, so the exact path runs
    * there unchanged — the q78 oracle pins it), small enough that a viral
    * near-dup cluster's bucket switches to the linear star+chain spanning
    * set long before its pair fan-out dominates a stage. */
  val DefaultDenseBucketCap = 1024

  /** Round-20 driver cap for the miner finishers ([[hardNegatives]],
    * [[marginMining]]): the compact scored frame is (qid, id, c6) — 24
    * bytes/row, |corpus|×|queries| rows — and at bench scale the queries'
    * walls are almost pure job/AQE floor over it (26k rows behind ~10
    * scheduled jobs). Under the cap the DISTRIBUTED cross-scoring pass
    * still computes every cosine; only the rank/statistic finish runs on
    * the driver, over ONE bounded `limit(cap+1)` fetch (≤ ~48 MB at the
    * default — the k-centroids bounded-collect class). 0 disables; values
    * ≥ Int.MaxValue clamp down rather than silently disabling. Over-cap
    * corpora (and non-long ids, or any null/NaN score — the distributed
    * NULLS LAST/NaN-ordering edge cases stay on the engine that defines
    * them) take the unchanged distributed path. */
  private[graft] def driverScoreCap(spark: SparkSession): Int =
    math.min(
      spark.conf.getOption("graft.margin.maxDriverScores")
        .map(_.toLong).getOrElse(2000000L),
      (Int.MaxValue - 1).toLong).toInt

  /** Bounded fetch of the compact scored frame for the driver finishers.
    * Returns null — caller falls back to the distributed path — when the
    * cap is off, either id column is not LongType, the row count exceeds
    * the cap, or any (qid, id, c6) cell is null or NaN. */
  private def fetchScoredBounded(
      scored: DataFrame, cap: Int): Array[(Long, Long, Double)] = {
    if (cap <= 0) return null
    val f = scored.schema.fields
    val long = org.apache.spark.sql.types.LongType
    if (f(0).dataType != long || f(1).dataType != long) return null
    val rows = scored.limit(cap + 1).collect()
    if (rows.length > cap) return null
    val out = new Array[(Long, Long, Double)](rows.length)
    var i = 0
    while (i < rows.length) {
      val r = rows(i)
      if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)) return null
      val c = r.getDouble(2)
      if (java.lang.Double.isNaN(c)) return null
      out(i) = (r.getLong(0), r.getLong(1), c)
      i += 1
    }
    out
  }

  /** (c6 desc, id asc) — the miners' rank order, total because (id) is
    * unique within a group. */
  private def rankLt(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def requireQueryFrameBounded(queries: DataFrame, op: String): Unit = {
    // limit(cap+1) keeps the check O(cap), never a full count of a
    // mistakenly corpus-sized frame
    val n = queries.limit(MaxBroadcastQueries + 1).count()
    require(n <= MaxBroadcastQueries,
      s"$op broadcast-scores the corpus against every query row " +
      s"(O(|corpus| x |queries|)); got > $MaxBroadcastQueries query rows. " +
      "Corpus-sized query frames belong on the ANN path: probe the " +
      "IVF/sign-LSH index per query (Similarity.Ivf.topK / SignLsh.topK) " +
      "and feed the survivors into the same scoring arithmetic.")
  }

  /** Build-once persistence for ANN indexes ("build once, query many").
    *
    * An index is a plain parquet directory partitioned by its cell column
    * (`bucket` for sign-LSH, `centroid_id` for IVF), so a probe is a
    * statically partition-pruned scan of a handful of cells — the 100 TB
    * shape. The location is deterministic per (source, index params): the
    * first query builds, every later query (across JVMs too) just reads.
    * Completeness is signalled by Spark's `_SUCCESS` marker — a crashed
    * build leaves no marker and is rebuilt. */
  object IndexStore {
    /** Index location keyed on (source path, source DATA fingerprint,
      * params). The fingerprint — [[graft.util.Fs.fingerprint]], the md5 of
      * the source's recursive (name, size, mtime) listing — folds the data's
      * identity into the path: rewriting the source table changes the
      * fingerprint, so the next query builds a fresh index at a new path
      * instead of silently probing a stale one. Metadata-only, O(files). */
    def pathFor(spark: SparkSession, sourcePath: String, indexName: String): String = {
      val key = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(sourcePath).substring(0, 12)
      val fp = graft.util.Fs.fingerprint(sourcePath,
        spark.sparkContext.hadoopConfiguration)
      s"${sys.props("java.io.tmpdir")}/graft-index/$key-$fp/$indexName"
    }

    def isBuilt(spark: SparkSession, path: String): Boolean =
      graft.util.Fs.exists(s"$path/_SUCCESS",
        spark.sparkContext.hadoopConfiguration)

    /** Location for a MAINTAINED index: keyed on the source path only, NOT
      * the data fingerprint — an index that absorbs appends in place must
      * keep a stable address while its source grows. Freshness is the
      * maintainer's job ([[Ivf.maintain]] / [[SignLsh.append]] drift
      * accounting), not the path's; use [[pathFor]] for build-once indexes
      * where any source change should force a fresh build. */
    def stablePathFor(sourcePath: String, indexName: String): String = {
      val key = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(sourcePath).substring(0, 12)
      s"${sys.props("java.io.tmpdir")}/graft-index/$key-live/$indexName"
    }

    /** Rewrite a cell-partitioned index directory so each cell is one file
      * again — incremental appends ([[Ivf.append]]/[[SignLsh.append]]) add
      * a file per batch per touched cell, and at daily-append cadence the
      * probe-side file-listing and row-group overhead creeps up. One
      * clustered rewrite into a sibling dir, then a swap; `sortCol` (e.g.
      * `bucket`) restores the within-file ordering row-group pruning feeds
      * on. Crash window: the swap is delete-then-rename, so a crash
      * between the two leaves the index ABSENT — the next `loadOrBuild`
      * rebuilds it (safe, not cheap); run compaction at a quiet hour. */
    def compactCells(spark: SparkSession, indexPath: String, cellCol: String,
                     sortCol: Option[String] = None): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val df = spark.read.parquet(indexPath)
      val tmp = indexPath + ".__graft_compact"
      val clustered = df.repartition(col(cellCol))
      val sorted = sortCol.fold(clustered)(c => clustered.sortWithinPartitions(c))
      sorted.write.mode(SaveMode.Overwrite).partitionBy(cellCol).parquet(tmp)
      graft.util.Fs.swapInto(tmp, indexPath, conf)
    }

    /** Append-volume accounting for maintained indexes: "base appended"
      * counts in a marker file. */
    private[operators] def readMeta(spark: SparkSession, path: String): (Long, Long) =
      graft.util.Fs.readMarker(s"$path/_graft_meta",
          spark.sparkContext.hadoopConfiguration)
        .map(_.split("\\s+")).collect { case Array(b, a) => (b.toLong, a.toLong) }
        .getOrElse((0L, 0L))

    private[operators] def writeMeta(spark: SparkSession, path: String,
                                     base: Long, appended: Long): Unit =
      graft.util.Fs.writeMarker(s"$path/_graft_meta", s"$base $appended",
        spark.sparkContext.hadoopConfiguration)

    /** Drop index generations for source paths whose data fingerprint no
      * longer matches — staleness-keyed paths make rebuilds SAFE but leak
      * the superseded dirs; vacuum reclaims them. `live` maps each source
      * path still in use; every `<md5(source)>-<fp>` dir whose fp differs
      * from the source's CURRENT fingerprint is deleted. Returns the number
      * of reclaimed generations. */
    def vacuum(spark: SparkSession, liveSources: Seq[String]): Int = {
      val conf = spark.sparkContext.hadoopConfiguration
      val root = s"${sys.props("java.io.tmpdir")}/graft-index"
      val current = liveSources.map { src =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(src).substring(0, 12) ->
          graft.util.Fs.fingerprint(src, conf)
      }.toMap
      val gens = graft.util.Fs.childDirsWithPrefix(root, "", conf)
      val stale = gens.filter { dir =>
        dir.split("-", 2) match {
          case Array(key, fp) => current.get(key).exists(_ != fp)
          case _ => false // unknown layout: leave it
        }
      }
      stale.foreach(d => graft.util.Fs.deleteRecursively(s"$root/$d", conf))
      stale.size
    }
  }

  /** Exact top-k by cosine against one query vector (given as a 1-row frame
    * with column `qv`). Tiebreak on id keeps the result total-ordered.
    * `scorer` defaults to the fused native kernel (registered on demand);
    * the HOF [[VectorFunctions.cosineSimilarity]] is bit-identical and
    * remains the declarative baseline. */
  def bruteForceTopK(embeddings: DataFrame, query: DataFrame, k: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     scorer: (Column, Column) => Column = null): DataFrame = {
    val score: (Column, Column) => Column =
      if (scorer != null) scorer
      else {
        graft.plans.CosineSimilarity.register(embeddings.sparkSession)
        cosineSimilarityNative
      }
    embeddings.crossJoin(broadcast(query))
      .withColumn("cos", score(col(vecCol), col("qv")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cosine"))
  }

  /** MMR defaults, shared VERBATIM with the q134 oracle (which
    * interpolates them into its SQL, so operator and oracle can never
    * silently desync — round-14 advisor item): λ = 0.7 scaled ×10 into
    * the integer weights 7 (relevance) / 3 (max-similarity), which keeps
    * the blended score on the inputs' 1e-6 grid (see [[mmrRerank]]). */
  val MmrRelWeight = 7
  val MmrSimWeight = 3
  val MmrK = 10
  val MmrPool = 20

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998) —
    * the diversity-aware selection used when retrieved context feeds an
    * LLM: from a relevance-ranked candidate pool, greedily pick the item
    * maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`, so the
    * second pick stops being a near-duplicate of the first.
    *
    * Scale shape: ONE corpus scan builds the top-`poolSize` pool by
    * quantized cosine (at 100 TB the pool comes from an ANN probe —
    * q24/q25/q36 — feeding this same re-rank; MMR itself is O(k·pool)
    * and runs on the driver over a POOL-BOUNDED collect, the centroid
    * rule). Pairwise pool similarities are computed by the SAME native
    * cosine kernel on a pool×pool frame (poolSize² tiny rows) — never
    * driver float math that could drift from the kernel.
    *
    * Engine parity: rel and sim are quantized to 6 places (rank-parity
    * discipline); the published score is `7·rel − 3·maxsim` — λ = 0.7
    * SCALED BY 10, which keeps the score on the same 1e-6 decimal grid
    * as its inputs (integer 7k − 3m over 10⁶). A plain `0.7·rel` carries
    * a 7th decimal that lands exactly on round-half ties whenever rel's
    * 6th digit is 5, and the engines' round() disagree on halves (the
    * q81 lesson); on-grid values sit ~1e-16 from their rounding target,
    * where both engines agree. Selection order: (score desc, vec_id asc)
    * — unique. Output: (rank, vec_id, relevance, mmr_score). */
  def mmrRerank(embeddings: DataFrame, queryVec: Array[Double], k: Int = MmrK,
                poolSize: Int = MmrPool, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    graft.plans.CosineSimilarity.register(spark)
    def r6(x: Double): Double = // Spark round() semantics: decimal HALF_UP
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    val pool = embeddings
      .select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .select(col("vec_id"), col("v"),
        (round(cosineSimilarityNative(col("v"),
          typedLit(queryVec.toSeq)), 6) + lit(0.0)).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    val rel = pool.map { case (id, _, r) => id -> r }.toMap
    // pool×pool sims through the kernel — poolSize² rows, one tiny job
    val sim = pool.toSeq.toDF("ia", "va", "ra")
      .crossJoin(pool.toSeq.toDF("ib", "vb", "rb"))
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        (round(cosineSimilarityNative(col("va"), col("vb")), 6) + lit(0.0))
          .as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val selected = scala.collection.mutable.ArrayBuffer[(Int, Long, Double, Double)]()
    val remaining = scala.collection.mutable.SortedSet[Long](pool.map(_._1): _*)
    while (selected.size < math.min(k, pool.length)) {
      val scored = remaining.toSeq.map { id =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => sim((id, s._2))).max
        (r6(MmrRelWeight.toDouble * rel(id) - MmrSimWeight.toDouble * maxSim), id)
      }
      val (score, best) = scored.minBy { case (s, id) => (-s, id) }
      selected += ((selected.size + 1, best, rel(best), score))
      remaining -= best
    }
    selected.toSeq.toDF("rank", "vec_id", "relevance", "mmr_score")
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the top-`k` most-similar corpus vectors whose label DIFFERS from the
    * query's — the "looks alike, isn't" pairs a retrieval/embedding model
    * trains against. Queries arrive as a small frame (qid, qv, qlabel)
    * and are broadcast; candidates never shuffle for scoring.
    *
    * SCALE CEILING: compute is O(|corpus| × |queries|) and the query
    * frame is broadcast whole — this is the small-query-frame regime
    * (training-batch negatives, not all-pairs mining), guarded at
    * [[MaxBroadcastQueries]] query rows. Past it, probe the IVF/sign-LSH
    * index per query (q36/q25's `topK`) and anti-filter on the label
    * instead of broadcast cross-scoring.
    *
    * The per-query top-k is two-phase so it scales past a handful of
    * queries: a first `row_number` over (qid, salt) keeps `k` survivors
    * per salt bucket (the shuffle spreads each query over `salts`
    * reducers instead of one), then a second window over the
    * `k × salts`-row remnant picks the global top-k. With few queries a
    * single window would serialize one reducer per query — the same skew
    * the salted join (q83) exists to break. */
  def hardNegatives(embeddings: DataFrame, queries: DataFrame, k: Int = 3,
                    salts: Int = 32, idCol: String = "vec_id",
                    vecCol: String = "embedding", labelCol: String = "label",
                    scorer: (Column, Column) => Column = null): DataFrame = {
    requireQueryFrameBounded(queries, "hardNegatives")
    val score: (Column, Column) => Column =
      if (scorer != null) scorer
      else {
        graft.plans.CosineSimilarity.register(embeddings.sparkSession)
        cosineSimilarityNative
      }
    // Rank on the 6-place-QUANTIZED cosine (the marginMining discipline):
    // ranking on the raw double would make cross-engine rank parity depend
    // on bit-identical doubles between the native kernel and the oracle
    // engine; after quantization the (cosine, id) total order is identical
    // whenever the kernels agree to 6 places, which is the contract the
    // q23 oracle already proves.
    // same scan-parallelism rebalance as marginMining: a single-file
    // corpus is one partition and would score on one core
    val par = embeddings.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (embeddings.rdd.getNumPartitions < par) embeddings.repartition(par)
      else embeddings
    val compact = balanced.crossJoin(broadcast(queries))
      .filter(col(labelCol) =!= col("qlabel") && col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(score(col(vecCol), col("qv")), 6).as("c6"))
    // Round-20 driver finisher (see [[driverScoreCap]]): the per-query
    // top-k is PURE rank logic — (c6 desc, id asc) is a total order, no
    // float is ever combined — so the driver ranking is bit-identical to
    // the salted two-phase windows (the salt phase only spreads the sort;
    // its local top-k provably contains the global top-k). Cap-0 equality
    // spec in SkewAndIvfSpec.
    val fetched = fetchScoredBounded(compact, driverScoreCap(balanced.sparkSession))
    if (fetched != null) {
      val spark = balanced.sparkSession
      import spark.implicits._
      return fetched.groupBy(_._1).toSeq.flatMap { case (qid, arr) =>
        arr.map(t => (t._2, t._3)).sortWith(rankLt).take(k)
          .zipWithIndex.map { case ((id, c6), i) => (qid, i + 1, id, c6) }
      }.toDF("qid", "rank", "neg_id", "cosine")
    }
    val scored = compact
      .withColumn("__salt", pmod(hash(col(idCol)), lit(salts)))
    val local = Window.partitionBy(col("qid"), col("__salt"))
      .orderBy(col("c6").desc, col(idCol).asc)
    val global = Window.partitionBy(col("qid"))
      .orderBy(col("c6").desc, col(idCol).asc)
    scored
      .withColumn("__rn", row_number().over(local))
      .filter(col("__rn") <= k)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"),
        col(idCol).as("neg_id"), col("c6").as("cosine"))
  }

  /** Margin-based pair mining (the Artetxe & Schwenk scoring used for
    * parallel-corpus / paired-data mining): a candidate pair (x, y) is
    * strong not when cos(x, y) is large in absolute terms but when it is
    * large RELATIVE to each side's neighborhood —
    *
    *   margin(x, y) = cos(x, y) / ((avgTopK_x + avgTopK_y) / 2)
    *
    * where avgTopK_x is the mean of x's `k` best cosines over the corpus
    * side and avgTopK_y is y's mean over the query side. The global
    * `topN` pairs by margin are returned. Queries are a small sampled
    * frame (qid, qv) and broadcast, so pair scoring never shuffles the
    * corpus; the full-corpus method would swap the broadcast cross for an
    * ANN probe (q24/q36) feeding the same margin arithmetic.
    *
    * Per-query top-k statistics reuse the [[hardNegatives]] salted
    * two-phase discipline (few queries would otherwise serialize one
    * reducer each); per-candidate statistics partition on the candidate
    * id (corpus-cardinality keys, no skew) and the two windows over that
    * partitioning share one exchange.
    *
    * SCALE CEILING: compute is O(|corpus| × |queries|) and the query
    * frame is broadcast whole — this is the small-query-frame regime,
    * guarded at [[MaxBroadcastQueries]] query rows. A corpus-sized query
    * frame belongs on the ANN path instead: probe the IVF/sign-LSH index
    * per query (q36/q25's `topK`) and feed the survivors' cosines into
    * the same margin arithmetic.
    *
    * The cross scores are computed ONCE and persisted as a COMPACT
    * (qid, id, c6) frame — ids plus one quantized double, the vectors
    * dropped before anything shuffles (round-15; the previous
    * recompute-not-materialize stance paid the cross-scoring pass twice
    * AND sorted vector-wide ~1 KB rows through both window exchanges —
    * measured 14.2 s vs 3.4 s DuckDB at sf1, the suite's largest compute
    * wall. The compact frame is 24 bytes/row: |X|·|Y| rows of ids+score
    * is ~60 MB at bench scale and spills cleanly at any scale, which is
    * a different object than materializing vector-wide cross rows).
    * Cache lifetime: the returned frame reads the compact scored cache
    * lazily — the caller owns it (drop via `spark.catalog.clearCache()`
    * or unpersist after the final action; the bench clears per pass).
    *
    * Engine parity: every cosine is quantized to 6 places BEFORE any
    * averaging (order-insensitive-sum rule), both averages divide by the
    * ACTUAL surviving neighborhood size (= least(k, n) — a side with fewer
    * than k rows would otherwise deflate its average and inflate every
    * margin), a zero mean-neighborhood denominator maps the margin to 0.0
    * explicitly (Spark would emit IEEE Infinity, the oracle engine's
    * division-by-zero differs — neither is a value to rank on), the margin
    * re-rounds to 6, and the returned floats are `+ 0.0`-canonicalized.
    * The top-N total order (margin desc, qid, cand_id) is unique. */
  def marginMining(corpus: DataFrame, queries: DataFrame, k: Int = 4,
                   topN: Int = 25, salts: Int = 32, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    requireQueryFrameBounded(queries, "marginMining")
    graft.plans.CosineSimilarity.register(corpus.sparkSession)
    // scoring parallelism is the corpus SCAN's: a small single-file corpus
    // is one partition, putting every cosine — and the cached frame all
    // three downstream branches read — on one core (the shingleRows
    // lesson; measured 10.0 s → sub-second for the sf1 scoring pass).
    // A many-split 100 TB corpus takes the free path.
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (corpus.rdd.getNumPartitions < par) corpus.repartition(par) else corpus
    val compact = balanced.crossJoin(broadcast(queries))
      .select(col("qid"), col(idCol),
        round(cosineSimilarityNative(col(vecCol), col("qv")), 6).as("c6"))
    // Round-20 driver finisher (see [[driverScoreCap]]): the distributed
    // pass still computes every cosine; under the cap the top-k means,
    // margins and the top-N pick replay on the driver over ONE bounded
    // fetch — replacing persist + count + the dx/dy/join/window stage
    // cascade (the query's wall was the ~10-job AQE floor, not data).
    // Rank orders are the identical total orders ((c6 desc, id asc) /
    // (c6 desc, qid asc)); each mean sums its ≤k quantized values in
    // rank order where the distributed sum order is partition-arbitrary
    // — the same ulp class the 6-place margin rounding already absorbs
    // across engines (the q92 stance; oracle re-verified at sf0.01 AND
    // sf0.1, cap-0 equality spec in MarginMiningSpec).
    val fetchedM = fetchScoredBounded(compact, driverScoreCap(balanced.sparkSession))
    if (fetchedM != null) {
      val spark = balanced.sparkSession
      import spark.implicits._
      def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      def topMean(a: Array[(Long, Double)]): Double = {
        val top = a.sortWith(rankLt).take(k)
        var s = 0.0; top.foreach(s += _._2)
        s / top.length
      }
      val dxm = fetchedM.groupBy(_._1)
        .map { case (qid, a) => qid -> topMean(a.map(t => (t._2, t._3))) }
      val dym = fetchedM.groupBy(_._2)
        .map { case (id, a) => id -> topMean(a.map(t => (t._1, t._3))) }
      val top = fetchedM.map { case (qid, id, c6) =>
          val denom = (dxm(qid) + dym(id)) / 2
          (qid, id, c6, if (denom == 0.0) 0.0 else r6(c6 / denom))
        }
        .sortWith { (a, b) =>
          a._4 > b._4 || (a._4 == b._4 &&
            (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)))
        }
        .take(topN)
        .map(t => (t._1, t._2, t._3 + 0.0, t._4 + 0.0))
      return top.toSeq.toDF("qid", "cand_id", "cosine", "margin")
    }
    val scored = compact
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE fanning out into the dx and dy branches:
    // lazily-persisted branches race to fill the cache and can run the
    // cross-scoring pass twice (the q44/q66 lesson)
    scored.count()

    val localW = Window.partitionBy(col("qid"), col("__salt"))
      .orderBy(col("c6").desc, col(idCol).asc)
    val globalW = Window.partitionBy(col("qid"))
      .orderBy(col("c6").desc, col(idCol).asc)
    // Averages divide by the surviving row count (= least(k, n)), never a
    // bare k: after the rank<=k filter count(*) IS min(k, neighborhood).
    val dx = scored
      .withColumn("__salt", pmod(hash(col(idCol)), lit(salts)))
      .withColumn("__rn", row_number().over(localW)).filter(col("__rn") <= k)
      .withColumn("__rg", row_number().over(globalW)).filter(col("__rg") <= k)
      .groupBy("qid").agg((sum(col("c6")) / count(lit(1))).as("dx"))

    val wy = Window.partitionBy(col(idCol)).orderBy(col("c6").desc, col("qid").asc)
    val wyAll = Window.partitionBy(col(idCol))
    val withDy = scored
      .withColumn("__rny", row_number().over(wy))
      .withColumn("dy",
        sum(when(col("__rny") <= k, col("c6"))).over(wyAll) /
          sum(when(col("__rny") <= k, lit(1))).over(wyAll))

    val denom = (col("dx") + col("dy")) / 2
    withDy.join(broadcast(dx), "qid")
      // zero mean-neighborhood: margin 0.0 on BOTH engines, never a
      // division whose IEEE/error behavior the engines disagree on
      .withColumn("margin",
        when(denom === 0.0, lit(0.0)).otherwise(round(col("c6") / denom, 6)))
      .orderBy(col("margin").desc, col("qid").asc, col(idCol).asc)
      .limit(topN)
      .select(col("qid"), col(idCol).as("cand_id"),
        (col("c6") + lit(0.0)).as("cosine"),
        (col("margin") + lit(0.0)).as("margin"))
  }

  /** Deterministic random-projection dimensionality reduction (the
    * sign-matrix flavor of Johnson–Lindenstrauss): out_j = Σ_i s(j,i)·v_i
    * / √outDim — the STANDARD JL scaling, so norms and pairwise Euclidean
    * distances are preserved in expectation (÷√dim would shrink them all
    * by √(outDim/dim); round-13 advisor catch) — with s(j,i) ∈ {−1,+1}
    * derived from the engine-portable md5
    * hash family — the projection is a pure function of (seed, j, i), so
    * any engine (and the DuckDB oracle) reproduces it bit-for-bit. The
    * matrix is outDim×dim, computed once on the driver and embedded as a
    * literal: the whole operator is a single codegen'd projection, no
    * shuffle, no broadcast join.
    *
    * Output is long-form (vec_id, dim, value) with value rounded to 6
    * places; the sum runs left-to-right over i on both engines (HOF
    * `aggregate` here, `list_sum` over a comprehension in the oracle) so
    * float association order matches. The `+ 0.0` after the round
    * canonicalizes IEEE −0.0 to +0.0: a sum landing in (−5e−7, 0] rounds
    * to a signed zero whose sign the two engines derive differently, and
    * the cell compare is textual ("0.0" ≠ "-0.0"). Mirrored in the
    * oracle. */
  def randomProjection(embeddings: DataFrame, outDim: Int = 16,
                       seed: String = "rp", idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val dim = firstVectorLength(embeddings, vecCol)
    val signs: Seq[Seq[Double]] = (0 until outDim).map { j =>
      (0 until dim).map { i =>
        val hex = org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$seed|$j|$i").substring(0, 8)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }
    }
    val s = typedLit(signs)
    val scale = math.sqrt(outDim.toDouble)
    val proj = transform(sequence(lit(0), lit(outDim - 1)), j =>
      round(
        aggregate(
          zip_with(col(vecCol), element_at(s, j + 1),
            (x, sg) => x.cast("double") * sg),
          lit(0.0), (acc, x) => acc + x) / scale,
        6) + lit(0.0))
    embeddings.select(col(idCol), posexplode(proj).as(Seq("dim", "value")))
      .select(col(idCol), col("dim").cast("long").as("dim"), col("value"))
  }

  /** All pairs with cosine ≥ `threshold` (embedding near-dup dedup).
    * Pre-normalizes once (norm computed into its own column, not per
    * element) so the pair score is a plain dot; pairs are blocked by
    * sign-LSH band collision exactly like MinHash banding, so this never
    * goes all-pairs at scale. 16 sign bits in 2 bands of 8 keep bucket
    * sizes ~n/256 per band; the dot is computed once per *distinct*
    * candidate pair, after dedup.
    *
    * `denseBucketCap` (0 = off, the exact default): a near-clique
    * duplicate cluster makes its band bucket's pair fan-out quadratic in
    * cluster size NO MATTER the plan — correct when the caller wants the
    * pairs (this operator's regime), pure waste when the caller only
    * needs CONNECTIVITY ([[semanticDedupGroups]]). With a cap, a bucket
    * of m > cap members emits the cosine-VERIFIED star+chain spanning
    * set — (bucket-min, x) for every member plus (prevById, x) —
    * 2(m-1) candidates whose surviving edges connect exactly the same
    * near-clique component; buckets at or under the cap keep the exact
    * per-pair semantics. Escalated buckets can in principle drop a pair
    * two mid-bucket members would have formed (a mixed bucket whose
    * members aren't near-dups of the bucket min), so the cap belongs on
    * component callers, not pair-inspection callers. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         nBits: Int = 16,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         denseBucketCap: Int = 0): DataFrame = {
    val dim = firstVectorLength(embeddings, vecCol)
    val normed = normalize(embeddings, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = withSignBits(normed, "v", dim, nBits)
    val half = nBits / 2
    // banded rows carry ONLY (id, band, key): shipping the vectors through
    // the band self-join multiplies shuffle bytes by the candidate fan-out
    // (the same dense-cluster trap measured in minhashLshPairs); vectors
    // are joined back from the persisted normalized frame for the DISTINCT
    // surviving pairs only.
    val banded = sig.select(col("vec_id"),
      explode(array(
        struct(lit(0).as("band"), col("sig").bitwiseAND(lit((1 << half) - 1)).as("key")),
        struct(lit(1).as("band"), shiftright(col("sig"), half).as("key")))).as("b"))
      .select(col("vec_id"), col("b.band"), col("b.key"))
    val cand =
      if (denseBucketCap <= 0) banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      else {
        // Dense-bucket escalation (connectivity callers — see scaladoc):
        // bucket size, bucket min and the previous member come out of ONE
        // window exchange over (band, key); buckets at or under the cap
        // keep the exact self-join, oversized buckets emit the verified
        // star+chain spanning set — 2(m-1) candidates instead of m(m-1)/2.
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("band"), col("key")).orderBy(col("vec_id"))
        val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val sized = banded
          .withColumn("__n", count(lit(1)).over(wAll))
          .withColumn("__min", min(col("vec_id")).over(wAll))
          .withColumn("__prev", lag(col("vec_id"), 1).over(w))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val small = sized.filter(col("__n") <= denseBucketCap)
          .select(col("vec_id"), col("band"), col("key"))
        val smallPairs = small.as("a")
          .join(small.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        val largePairs = sized.filter(col("__n") > denseBucketCap)
          .select(explode(filter(array(
            struct(col("__min").as("vec_a"), col("vec_id").as("vec_b")),
            struct(coalesce(col("__prev"), col("vec_id")).as("vec_a"),
              col("vec_id").as("vec_b"))),
            p => p.getField("vec_a") < p.getField("vec_b"))).as("p"))
          .select(col("p.vec_a"), col("p.vec_b"))
        smallPairs.unionByName(largePairs).distinct()
      }
    cand
      .join(normed.toDF("vec_a", "va"), "vec_a")
      .join(normed.toDF("vec_b", "vb"), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(dotProduct(col("va"), col("vb")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic deduplication: connected components of the
    * cosine-similarity graph at `threshold`, electing the min-id member of
    * each component as the canonical representative.
    *
    * Composition of two already-scale-shaped pieces: the edge list is
    * [[cosineNearDupPairs]] (sign-LSH banded, never all-pairs) and the
    * grouping is [[Graph.connectedComponents]] min-label propagation over
    * those edges (rounds = component diameter; near-dup clusters are
    * near-cliques, so 2-4 rounds). A curation pipeline keeps `keep = true`
    * rows and drops the rest — the standard embedding-level dedup pass run
    * over web-scale corpora after exact/fuzzy text dedup.
    *
    * Dense-cluster escalation is ON here (`denseBucketCap`, default
    * [[DefaultDenseBucketCap]]): components need connectivity, not pair
    * volume, so a viral cluster's bucket emits the verified star+chain
    * spanning set instead of its quadratic pair set — the same
    * cap-and-escalate move [[graft.operators.TextDedup.minhashLshGroups]]
    * makes by never materializing pairs at all. On the bench corpora no
    * bucket reaches the cap, so the exact path runs and the all-pairs
    * oracle pins it; the SCALE battery proves the escalated wall on
    * planted hot buckets.
    *
    * Output: `(vec_id, cluster_id, keep)` for EVERY input vector —
    * singletons are their own cluster with `keep = true`. */
  def semanticDedupGroups(embeddings: DataFrame, threshold: Double,
                          nBits: Int = 16,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          denseBucketCap: Int = DefaultDenseBucketCap): DataFrame = {
    val edges = cosineNearDupPairs(embeddings, threshold, nBits, idCol, vecCol,
        denseBucketCap)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    val comp = Graph.connectedComponents(
      embeddings.select(col(idCol).as("id")), edges)
    comp.select(col("id").as("vec_id"), col("component").as("cluster_id"),
      (col("id") === col("component")).as("keep"))
  }

  /** (id, v): unit-normalized double vector via the native
    * [[graft.plans.NormalizeVector]] kernel — the declarative chain
    * (cast-transform + norm aggregate + divide-transform) is three
    * CodegenFallback higher-order functions and was the measured per-row
    * bottleneck of every pre-normalizing similarity path. Bit-identical
    * accumulation order, so oracle parity is unchanged. */
  private def normalize(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.plans.NormalizeVector.register(embeddings.sparkSession)
    embeddings.select(col(idCol).as("vec_id"),
      graft.plans.NormalizeVector.normalize(col(vecCol)).as("v"))
  }

  /** Shared training constants for the sample-fit quantizers. Declared
    * ONCE so the DuckDB replay oracles (ExtQueries' q36/q98 builders)
    * derive the same literals from these vals instead of duplicating
    * them — a parameter drift then breaks the build or the oracle
    * loudly, not silently (round-19, advisor fix). */
  val LloydIters = 5
  val DefaultTrainSample = 65536

  /** Plain Lloyd's iterations over an in-memory sample — deterministic
    * for a given seed; empty cells keep their previous center. Shared by
    * the IVF coarse quantizer and the PQ sub-quantizers. */
  private[operators] def lloyd(points: Array[Array[Double]], k: Int,
                               seed: Long, iters: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot train centroids on an empty sample")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    var centers = rnd.shuffle(points.indices.toVector)
      .take(math.min(k, points.length)).map(points).toArray
    (0 until iters).foreach { _ =>
      val sums = Array.fill(centers.length, dim)(0.0)
      val counts = new Array[Long](centers.length)
      points.foreach { p =>
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < centers.length) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = p(i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      centers = Array.tabulate(centers.length)(c =>
        if (counts(c) == 0) centers(c) else sums(c).map(_ / counts(c)))
    }
    centers
  }

  /** The `maxSample` normalized vectors with the smallest
    * (hash60(vec_id), vec_id) — the md5-ordered deterministic sample both
    * engines reproduce with one ORDER BY; shared by the exact IVF and PQ
    * trainers (a limit() over leading partitions has no SQL twin). */
  private def hashOrderedSample(normed: DataFrame,
                                maxSample: Int): Array[Array[Double]] = {
    graft.plans.Hash60.register(normed.sparkSession)
    normed
      .withColumn("__h", graft.functions.TextFunctions.hash60Fast(
        col("vec_id").cast("string")))
      .orderBy(col("__h"), col("vec_id"))
      .limit(maxSample)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
  }

  /** Driver-side integer micro-unit Lloyd (the q118 exact-carry trick):
    * init = the first `k` sample rows (callers pass an md5-ordered
    * sample), per round assignment against `cq/1e6` doubles (strict <,
    * first-wins — the NearestCentroid contract), exact BIGINT sums of the
    * `floor(x·1e6)` micro-units, `Math.floorDiv` means; empty cells keep
    * their center. Every step is exact integer math or a fixed-order
    * deterministic IEEE expression, so a second engine replays training
    * cell-exactly. Shared by [[Ivf]] (`exact = true`) and [[Pq]]
    * (`exact = true`, once per subspace). */
  private def exactLloydDriver(sample: Array[Array[Double]], k: Int,
                               iters: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    val pts: Array[Array[Long]] =
      sample.map(_.map(x => math.floor(x * 1e6).toLong))
    var cq: Array[Array[Long]] = pts.take(k).map(_.clone())
    for (_ <- 1 to iters) {
      val centers = cq.map(_.map(_.toDouble / 1e6))
      val sums = Array.fill(k, dim)(0L)
      val counts = new Array[Long](k)
      var pi = 0
      while (pi < sample.length) {
        val v = sample(pi)
        var best = -1
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        counts(best) += 1
        val qv = pts(pi)
        var i = 0
        while (i < dim) { sums(best)(i) += qv(i); i += 1 }
        pi += 1
      }
      cq = Array.tabulate(k)(c =>
        if (counts(c) == 0) cq(c)
        else Array.tabulate(dim)(i => Math.floorDiv(sums(c)(i), counts(c))))
    }
    cq.map(_.map(_.toDouble / 1e6))
  }

  /** Deterministic pseudo-random hyperplane for plane j: component d is the
    * portable 60-bit md5 hash of "plane_j_d" scaled to [-1, 1) — the exact
    * formula the oracle recomputes in SQL. Evaluated on the driver into a
    * literal array: identical values, but the sign expression stays a small
    * zip_with fold instead of `nBits × dim` unrolled terms (which blew up
    * optimizer/codegen time far beyond the actual data cost). */
  private def planeVector(plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val hex = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"plane_${plane}_$d").substring(0, 15)
      java.lang.Long.parseLong(hex, 16).toDouble / math.pow(2, 59) - 1.0
    }

  /** Append `sig`: an int whose bit j is the sign of dot(v, plane_j).
    * Computed by the native [[graft.plans.SignLshBits]] — the HOF
    * formulation (aggregate ∘ zip_with per plane) is CodegenFallback,
    * interpreted per element, and was the measured build bottleneck; the
    * native kernel is one fused nBits × dim loop with the identical fold
    * order (bucket assignments bit-identical). */
  private def withSignBits(df: DataFrame, vecCol: String, dim: Int, nBits: Int): DataFrame = {
    val planes = Array.tabulate(nBits)(j => planeVector(j, dim))
    graft.plans.SignLshBits.register(df.sparkSession)
    df.withColumn("sig", graft.plans.SignLshBits.assign(col(vecCol), planes))
  }

  private def firstVectorLength(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** The (vec_id, band, key) banded frame [[cosineNearDupPairs]] blocks
    * on, exposed for the scale probe / battery (bucket-size histograms
    * are how the dense-bucket cap's headroom claim is measured). */
  private[operators] def signBitsForProbe(embeddings: DataFrame, nBits: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = firstVectorLength(embeddings, vecCol)
    val normed = normalize(embeddings, idCol, vecCol)
    val sig = withSignBits(normed, "v", dim, nBits)
    val half = nBits / 2
    sig.select(col("vec_id"),
      explode(array(
        struct(lit(0).as("band"), col("sig").bitwiseAND(lit((1 << half) - 1)).as("key")),
        struct(lit(1).as("band"), shiftright(col("sig"), half).as("key")))).as("b"))
      .select(col("vec_id"), col("b.band"), col("b.key"))
  }

  /** IVF (inverted-file) ANN index: k-means centroids partition the vector
    * space; a query probes only the `nProbe` nearest cells and re-scores
    * exactly. The scale shape end to end:
    *
    *  - **fit on a bounded sample, driver-side** (`maxSample` rows of the
    *    normalized frame): IVF needs rough cells, not converged clustering,
    *    and sample-fit is how every production IVF trains at corpus scale —
    *    the fit cost is O(sample), independent of table size;
    *  - **assign distributed, one fused loop per row**: the trained centroid
    *    matrix ships into codegen via [[graft.plans.NearestCentroid]] — no
    *    ML-pipeline job graph, no vector-type conversions, stays inside
    *    WholeStageCodegen (measured 7.2s → sub-second at sf0.1);
    *  - the index is a plain DataFrame keyed by `centroid_id` — written
    *    partitioned by that column, a probe is a partition-pruned scan of
    *    nProbe/nCentroids of the data.
    *
    * Two training modes:
    *  - `exact = false` (default): Lloyd with float means from a
    *    `Random(seed)`-shuffled init — deterministic for a given (seed,
    *    input file layout) but with no cross-engine oracle; retrieval
    *    quality is spec-tested against brute force.
    *  - `exact = true` (round-18, the q118 portable-replay trick applied
    *    to the coarse quantizer): integer micro-unit centroid state from
    *    an md5-ordered init, making training + assignment + probe
    *    selection + re-rank all DuckDB-replayable — see [[trainExact]]. */
  final case class Ivf(nCentroids: Int, nProbe: Int, seed: Long = 42L,
                       maxSample: Int = DefaultTrainSample, exact: Boolean = false) {

    /** Build the index ONCE into `path` (index parquet partitioned by
      * `centroid_id`, plus a tiny `centers` table) and return the persisted
      * form; later calls — including from other JVMs — skip KMeans training
      * entirely and read the parquet. `embeddings` is by-name: a load hit
      * never evaluates it. */
    def loadOrBuild(spark: SparkSession, embeddings: => DataFrame, path: String,
                    idCol: String = "vec_id", vecCol: String = "embedding")
        : (Array[Array[Double]], DataFrame) = {
      // centers are written LAST, so their _SUCCESS implies a complete index
      if (!IndexStore.isBuilt(spark, s"$path/centers")) {
        val (centers, index) = build(embeddings, idCol, vecCol)
        // cluster by cell before the partitioned write (same write-
        // amplification control as the sign-LSH index)
        index.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
          .partitionBy("centroid_id").parquet(s"$path/index")
        spark.createDataFrame(centers.toSeq.zipWithIndex
            .map { case (c, i) => (i, c.toSeq) })
          .toDF("centroid_id", "center")
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/centers")
      }
      val centers = spark.read.parquet(s"$path/centers")
        .orderBy("centroid_id").collect()
        .map(_.getSeq[Double](1).toArray)
      (centers, spark.read.parquet(s"$path/index"))
    }

    /** (cluster centers, index frame (vec_id, v, centroid_id)). */
    def build(embeddings: DataFrame, idCol: String = "vec_id",
              vecCol: String = "embedding"): (Array[Array[Double]], DataFrame) = {
      val normed = normalize(embeddings, idCol, vecCol)
      val centers =
        if (exact) trainExact(normed)
        else {
          // bounded driver-side sample; rough cells are all IVF needs.
          // limit() draws from the leading partitions — for pathologically
          // cluster-ordered data pass a pre-shuffled frame.
          val sample = normed.select(col("v")).limit(maxSample)
            .collect().map(_.getSeq[Double](0).toArray)
          lloyd(sample, nCentroids, seed, iters = LloydIters)
        }
      val spark = embeddings.sparkSession
      graft.plans.NearestCentroid.register(spark)
      val index = normed.withColumn("centroid_id",
        graft.plans.NearestCentroid.assign(col("v"), centers))
      (centers, index)
    }

    /** Integer micro-unit Lloyd over an md5-ordered bounded sample — the
      * q118 portable-sketch trick (exact integer carry + md5-derived
      * determinism + second-engine replay) applied to IVF's coarse
      * quantizer, which was the ONLY non-replayable step of the whole
      * q36 pipeline (assignment, probe selection and exact re-rank were
      * already deterministic IEEE expressions a second engine evaluates
      * identically — the q117 pattern).
      *
      *  - sample = the `maxSample` vectors with the smallest
      *    (hash60(vec_id), vec_id) — an md5-ordered uniform draw both
      *    engines can reproduce with one ORDER BY (a limit() over leading
      *    partitions is deterministic for one file layout but has no SQL
      *    twin);
      *  - init = the first `nCentroids` of that same order;
      *  - per round: assignment against `cq/1e6` doubles (strict <,
      *    first-wins — the [[graft.plans.NearestCentroid]] contract the
      *    oracle mirrors with `row_number() ORDER BY dist, cid`), then
      *    EXACT BIGINT sums of the `floor(v·1e6)` micro-units and
      *    `Math.floorDiv` means — order-independent, so cross-partition /
      *    cross-engine sum order cannot change a single cell.
      *
      * The quantization shifts each trained center by ≤ 1e-6 per element
      * per round vs float Lloyd — irrelevant for rough IVF cells (recall
      * gates unchanged), decisive for verifiability. Sample fit stays
      * O(maxSample · k · dim · iters) on the driver, independent of
      * corpus size.
      *
      * Quality parity vs the float path, measured round-18: single-query
      * recall@10 swings 0.3–0.8 across equally-valid deterministic inits
      * on the isotropic test embeddings (one query is a coin flip at
      * 16 cells / 4 probes); MEAN recall@10 over 20 query vectors is
      * 0.58 (exact, sf0.1) vs 0.60 (float) and 0.565 vs 0.565 at sf1 —
      * statistically identical. Bench publishes the mean-20 number as
      * `q36_mean20_recall_at_10` so the trend is luck-proof. */
    private def trainExact(normed: DataFrame): Array[Array[Double]] = {
      val sample = hashOrderedSample(normed, maxSample)
      require(sample.length >= nCentroids,
        s"IVF exact training needs >= $nCentroids vectors, got ${sample.length}")
      exactLloydDriver(sample, nCentroids, iters = LloydIters)
    }

    /** Incremental maintenance: fold `newVectors` into an EXISTING index
      * WITHOUT retraining or rewriting it. New rows are assigned to the
      * already-trained centroids distributedly, de-duplicated against the
      * ids already present in their target cells (a partition-pruned scan —
      * replaying a batch is a no-op), and appended as new files into ONLY
      * the touched `centroid_id=` partition directories; untouched cells
      * keep their bytes. At 100 TB with daily appends this turns index
      * upkeep from a full rebuild into O(batch + touched cells).
      *
      * The trade: appended vectors live in yesterday's cell geometry. The
      * `_graft_meta` marker tracks appended volume so [[maintain]] can
      * trigger a full retrain once drift passes a threshold. Returns the
      * number of rows actually appended. */
    def append(spark: SparkSession, newVectors: DataFrame, path: String,
               idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
      require(IndexStore.isBuilt(spark, s"$path/centers"),
        s"append requires a built index at $path — call loadOrBuild first")
      val centers = spark.read.parquet(s"$path/centers")
        .orderBy("centroid_id").collect()
        .map(_.getSeq[Double](1).toArray)
      graft.plans.NearestCentroid.register(spark)
      val assigned = normalize(newVectors, idCol, vecCol)
        .withColumn("centroid_id",
          graft.plans.NearestCentroid.assign(col("v"), centers))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // touched-cell list is metadata-scale (≤ nCentroids values)
        val touched = assigned.select("centroid_id").distinct()
          .collect().map(_.getInt(0)).toSeq
        val existingIds = spark.read.parquet(s"$path/index")
          .filter(col("centroid_id").isin(touched: _*))
          .select(col("vec_id"))
        val fresh = assigned.join(existingIds, Seq("vec_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = fresh.count()
        if (n > 0)
          fresh.repartition(col("centroid_id"))
            .write.mode(SaveMode.Append)
            .partitionBy("centroid_id").parquet(s"$path/index")
        val (base, appended) = IndexStore.readMeta(spark, path)
        IndexStore.writeMeta(spark, path, base, appended + n)
        fresh.unpersist()
        n
      } finally { assigned.unpersist(): Unit }
    }

    /** One-file-per-cell rewrite after a run of appends (see
      * [[IndexStore.compactCells]]); centers and the drift meta are
      * untouched. */
    def compact(spark: SparkSession, path: String): Unit =
      IndexStore.compactCells(spark, s"$path/index", "centroid_id")

    /** Keep a maintained index fresh: build it if absent, retrain it when
      * appended volume since the last full build exceeds
      * `driftThreshold` × base (stale centroids degrade recall), and fold
      * the batch in place otherwise. `allEmbeddings` is by-name — only a
      * (re)build evaluates it. */
    def maintain(spark: SparkSession, allEmbeddings: => DataFrame,
                 newVectors: DataFrame, path: String,
                 driftThreshold: Double = 0.5,
                 idCol: String = "vec_id", vecCol: String = "embedding")
        : (Array[Array[Double]], DataFrame) = {
      val conf = spark.sparkContext.hadoopConfiguration
      if (IndexStore.isBuilt(spark, s"$path/centers")) {
        val (base, appended) = IndexStore.readMeta(spark, path)
        val batch = newVectors.count()
        if (base > 0 && (appended + batch).toDouble / base > driftThreshold) {
          graft.util.Fs.deleteRecursively(path, conf) // retrain from scratch
        } else {
          append(spark, newVectors, path, idCol, vecCol): Unit
          return loadOrBuild(spark, allEmbeddings, path, idCol, vecCol)
        }
      }
      val out = loadOrBuild(spark, allEmbeddings, path, idCol, vecCol)
      val n = out._2.count()
      IndexStore.writeMeta(spark, path, n, 0L)
      out
    }

    /** Plain Lloyd's iterations over the in-memory sample — deterministic
      * for a given seed; empty cells keep their previous center. */
    private def lloyd(points: Array[Array[Double]], k: Int, seed: Long,
                      iters: Int): Array[Array[Double]] =
      Similarity.lloyd(points, k, seed, iters)

    /** Top-k via probed cells + exact re-score. The centroid shortlist is
      * computed on the driver (centroids are tiny by construction). */
    def topK(centers: Array[Array[Double]], index: DataFrame, query: DataFrame,
             k: Int = 10): DataFrame = {
      val qv = query.select(col("qv")).head().getSeq[Any](0)
        .map { case f: Float => f.toDouble; case d: Double => d }.toArray
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val normedQ = qv.map(_ / qn)
      val probes = centers.zipWithIndex
        .map { case (c, i) => (i, c.zip(normedQ).map { case (a, b) => a * b }.sum) }
        .sortBy(-_._2).take(nProbe).map(_._1)
      index
        .filter(col("centroid_id").isin(probes.toSeq: _*))
        .withColumn("cos", dotProduct(col("v"), typedLit(normedQ)))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(k)
        .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
    }
  }

  /** Sign-LSH index + exact re-scoring ANN. Build once, query many.
    *
    * `nTables` independent hash tables (OR-amplification, the classic
    * Indyk–Motwani construction): each table hashes with its own `nBits`
    * hyperplanes and a probe unions the tables' candidate sets before one
    * exact re-score. One table at Hamming≤1 published corpus recall@10 of
    * 0.1 on the isotropic test embeddings (per-bit agreement for a
    * cos≈0.3 neighbor is only ~0.6, so a single 8-bit signature almost
    * never lands within one flip). The bits/tables/probe tradeoff,
    * measured on the real corpora (2k–20k vectors): 4×8-bit tables at
    * Hamming≤2 reach recall@10 0.9 but their fat probe ball reads HALF
    * the corpus (r13's config — a 2× index); 8×12-bit tables at the same
    * Hamming≤2 hold recall 0.8–0.9 at scan_frac 0.16 — finer buckets cut
    * each table's candidate set ~8× and the extra OR-tables buy the
    * recall back. Isotropic data still bounds how far this goes (14-bit
    * tables drop recall to 0.6 at scan 0.06); data with real cluster
    * structure prunes much harder (planted near-duplicates hit at
    * Hamming 0). Small corpora should widen the probe ball instead of
    * paying more tables (multi-probe is the cheap recall knob when the
    * whole corpus is a few hundred rows). Storage cost is the textbook
    * one: vectors are stored
    * once PER TABLE (k·nTables bytes/vector) so the probe re-scores
    * in-place with zero joins; a 100 TB deployment that can't afford the
    * duplication stores id-only posting lists per table and re-fetches
    * vectors by id join, trading bytes for one shuffle. */
  final case class SignLsh(nBits: Int, dim: Int, nTables: Int = 1) {
    require(nTables >= 1 && nTables <= 16, s"nTables must be 1..16, got $nTables")

    /** Directory partitioning is TWO-LEVEL: `2^nBits` buckets would mean
      * `2^nBits` directories of tiny files — an object-store anti-pattern
      * that also made the sf0.1 build 10× slower than the signature
      * computation itself. Dirs are keyed on (table, bucket high bits)
      * (≤32 groups per table); within a group file, rows are sorted by
      * `bucket`, so a probe prunes directories on `bucket_grp` and
      * row-groups on the sorted `bucket` min/max stats. */
    private val grpShift: Int = math.max(0, nBits - 5)
    private val nGrps: Int = 1 << (nBits - grpShift)

    // >>> to match shiftrightunsigned in the persisted layout — arithmetic
    // >> would compute a different (negative) group for sign-bit-set
    // buckets at nBits = 32 and silently miss their partitions
    private[operators] def groupOf(bucket: Int): Int = bucket >>> grpShift

    /** Global directory cell for (table, bucket): table-major so each
      * table's groups are contiguous. For nTables=1 this is exactly the
      * pre-multi-table `bucket >>> grpShift` layout. */
    private[operators] def cellOf(tbl: Int, bucket: Int): Int =
      tbl * nGrps + groupOf(bucket)

    /** Table t hashes with planes `t*nBits .. t*nBits+nBits-1` — disjoint
      * deterministic hyperplane sets, no shared bits between tables. */
    private def tablePlanes(t: Int): Array[Array[Double]] =
      Array.tabulate(nBits)(j => planeVector(t * nBits + j, dim))

    /** Index frame: (vec_id, v normalized double, tbl, bucket) — one row
      * per (vector, table). All `nTables` signatures are computed in ONE
      * pass over the vectors (an array of native-kernel calls, then
      * posexplode), never nTables scans. */
    def index(embeddings: DataFrame, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
      val normed = normalize(embeddings, idCol, vecCol)
      graft.plans.SignLshBits.register(normed.sparkSession)
      val sigs = array((0 until nTables).map(t =>
        graft.plans.SignLshBits.assign(col("v"), tablePlanes(t))): _*)
      normed.select(col(idCol), col("v"), posexplode(sigs).as(Seq("tbl", "bucket")))
    }

    /** Build the index ONCE into `path` (parquet partitioned by
      * `bucket_grp`, bucket-sorted within files) and return the persisted
      * frame; later calls — across JVMs too — read the parquet.
      * `embeddings` is by-name: a load hit never evaluates it. */
    def loadOrBuild(spark: SparkSession, embeddings: => DataFrame, path: String,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
      if (!IndexStore.isBuilt(spark, path))
        // cluster by group before the partitioned write (each dir written
        // by one task as one file), sort by bucket inside for row-group
        // pruning stats
        index(embeddings, idCol, vecCol)
          .withColumn("bucket_grp",
            col("tbl") * nGrps + shiftrightunsigned(col("bucket"), grpShift))
          .repartition(col("bucket_grp"))
          .sortWithinPartitions("bucket")
          .write.mode(SaveMode.Overwrite)
          .partitionBy("bucket_grp").parquet(path)
      spark.read.parquet(path)
    }

    /** Incremental maintenance for the persisted sign-LSH index: bucket
      * assignment is DETERMINISTIC (fixed hyperplanes, no trained state),
      * so appended vectors land in exactly the cells a full rebuild would
      * put them in — no drift, no retrain trigger needed. New rows are
      * de-duplicated against the ids already in their target groups (a
      * partition-pruned scan; replays are no-ops) and appended as new
      * files into ONLY the touched `bucket_grp=` directories, each file
      * bucket-sorted so row-group pruning keeps working. Untouched groups
      * keep their bytes. Returns the number of rows appended. */
    def append(spark: SparkSession, newVectors: DataFrame, path: String,
               idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
      require(IndexStore.isBuilt(spark, path),
        s"append requires a built index at $path — call loadOrBuild first")
      val assigned = index(newVectors, idCol, vecCol)
        .withColumn("bucket_grp",
          col("tbl") * nGrps + shiftrightunsigned(col("bucket"), grpShift))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val touched = assigned.select("bucket_grp").distinct()
          .collect().map(_.getInt(0)).toSeq
        val existingIds = spark.read.parquet(path)
          .filter(col("bucket_grp").isin(touched: _*))
          .select(col("vec_id"))
        val fresh = assigned.join(existingIds, Seq("vec_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = fresh.count()
        if (n > 0)
          fresh.repartition(col("bucket_grp"))
            .sortWithinPartitions("bucket")
            .write.mode(SaveMode.Append)
            .partitionBy("bucket_grp").parquet(path)
        fresh.unpersist()
        n
      } finally { assigned.unpersist(): Unit }
    }

    /** One-file-per-group rewrite after a run of appends, restoring the
      * bucket-sorted within-file order row-group pruning feeds on (see
      * [[IndexStore.compactCells]]). */
    def compact(spark: SparkSession, path: String): Unit =
      IndexStore.compactCells(spark, path, "bucket_grp", Some("bucket"))

    /** Sign signature of an (un-normalized) query vector in table `tbl`,
      * computed on the driver — same planes, same left-to-right fold order
      * as the expression path in [[index]], so bucket assignment matches. */
    def signatureOf(qv: Array[Double], tbl: Int = 0): Int = {
      val n = math.sqrt(qv.map(x => x * x).foldLeft(0.0)(_ + _))
      val qn = qv.map(_ / n)
      val planes = tablePlanes(tbl)
      (0 until nBits).map { j =>
        val dot = qn.zip(planes(j)).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
        if (dot >= 0) 1 << j else 0
      }.sum
    }

    /** Probe ball: every bucket within Hamming distance `h` of `sig`.
      * h=1 → nBits+1 buckets (the classic multi-probe set); h=2 adds the
      * C(nBits,2) two-bit flips — the RECALL/COST KNOB: each extra
      * Hamming level multiplies probed buckets (and so candidates
      * re-scored exactly) by ~nBits/2 while recall climbs toward
      * brute force. Probe counts stay driver-side literals, so the scan
      * is statically pruned whatever h is. */
    private[operators] def probesFor(sig: Int, h: Int): Seq[Int] = {
      require(h >= 0 && h <= 3, s"probeHamming must be 0..3, got $h")
      val h0 = Seq(sig)
      val h1 = if (h >= 1) (0 until nBits).map(j => sig ^ (1 << j)) else Nil
      val h2 = if (h >= 2)
        for (i <- 0 until nBits; j <- i + 1 until nBits)
          yield sig ^ (1 << i) ^ (1 << j)
      else Nil
      val h3 = if (h >= 3)
        for (i <- 0 until nBits; j <- i + 1 until nBits; l <- j + 1 until nBits)
          yield sig ^ (1 << i) ^ (1 << j) ^ (1 << l)
      else Nil
      h0 ++ h1 ++ h2 ++ h3
    }

    /** Top-k through a PERSISTED index: the query signature and its probe
      * set (Hamming ≤ `probeHamming`) are computed on the driver, so
      * the scan is statically partition-pruned to the probe groups (and
      * row-group-pruned to the probe buckets inside them) — no join, no
      * full sweep. */
    def topKPruned(indexDf: DataFrame, qv: Array[Double], k: Int = 10,
                   probeHamming: Int = 1): DataFrame = {
      val n = math.sqrt(qv.map(x => x * x).foldLeft(0.0)(_ + _))
      val qn = qv.map(_ / n)
      // per-table probe sets, computed on the driver
      val perTable = (0 until nTables)
        .map(t => t -> probesFor(signatureOf(qv, t), probeHamming))
      val cells = perTable.flatMap { case (t, ps) => ps.map(p => cellOf(t, p)) }.distinct
      // partition-prune on the dir column when present (persisted layout);
      // an in-memory index frame has no bucket_grp and needs no pruning
      val pruned =
        if (indexDf.columns.contains("bucket_grp"))
          indexDf.filter(col("bucket_grp").isin(cells: _*))
        else indexDf
      val hit = perTable.map { case (t, ps) =>
        col("tbl") === t && col("bucket").isin(ps: _*)
      }.reduce(_ || _)
      // a vector can surface from several tables — dedup BEFORE scoring
      // (every copy carries the identical normalized v)
      pruned.filter(hit)
        .dropDuplicates("vec_id")
        .withColumn("cos", dotProduct(col("v"), typedLit(qn.toSeq)))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(k)
        .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
    }

    /** Fraction of distinct corpus vectors the probe set touches — the
      * honest cost side of the recall/cost tradeoff, published per round
      * by Bench's ann_quality section (recall without scan fraction is
      * half a number: brute force has recall 1.0). Diagnostic only, two
      * counting jobs. */
    def candidateFraction(indexDf: DataFrame, qv: Array[Double],
                          probeHamming: Int = 1): Double = {
      val perTable = (0 until nTables)
        .map(t => t -> probesFor(signatureOf(qv, t), probeHamming))
      val hit = perTable.map { case (t, ps) =>
        col("tbl") === t && col("bucket").isin(ps: _*)
      }.reduce(_ || _)
      val total = indexDf.select("vec_id").distinct().count()
      val cand = indexDf.filter(hit).select("vec_id").distinct().count()
      if (total == 0) 0.0 else cand.toDouble / total
    }

    /** Top-k through the index: probe every bucket within Hamming
      * distance `probeHamming` of the query bucket (see [[probesFor]]),
      * re-score exactly, take k. */
    def topK(indexDf: DataFrame, query: DataFrame, k: Int = 10,
             probeHamming: Int = 1): DataFrame = {
      require(probeHamming >= 0 && probeHamming <= 3,
        s"probeHamming must be 0..3, got $probeHamming")
      val normedQ = normalize(query.withColumn("__qid", lit(0L)), "__qid", "qv")
        .withColumnRenamed("v", "qn").drop("vec_id")
      graft.plans.SignLshBits.register(normedQ.sparkSession)
      val qsigs = array((0 until nTables).map(t =>
        graft.plans.SignLshBits.assign(col("qn"), tablePlanes(t))): _*)
      val q = normedQ.select(col("qn"), posexplode(qsigs).as(Seq("tbl", "qbucket")))
      val xors: Seq[Int] = Seq(0) ++
        (if (probeHamming >= 1) (0 until nBits).map(1 << _) else Nil) ++
        (if (probeHamming >= 2)
           for (i <- 0 until nBits; j <- i + 1 until nBits)
             yield (1 << i) | (1 << j)
         else Nil) ++
        (if (probeHamming >= 3)
           for (i <- 0 until nBits; j <- i + 1 until nBits;
                l <- j + 1 until nBits)
             yield (1 << i) | (1 << j) | (1 << l)
         else Nil)
      val probes = q.select(col("qn"), col("tbl"),
        explode(array(xors.map(m =>
          col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
      indexDf.join(broadcast(probes), Seq("tbl", "bucket"))
        .dropDuplicates("vec_id")
        .withColumn("cos", dotProduct(col("v"), col("qn")))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(k)
        .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
    }
  }

  /** Product quantization — the ANN MEMORY lever at 100 TB scale. A
    * 64-dim float vector (256 bytes) compresses to `m` small integer
    * codes (8 ints at m=8; one byte each on disk after parquet dictionary
    * encoding), and approximate inner products cost m TABLE LOOKUPS per
    * row (asymmetric distance computation: the query side stays exact,
    * the corpus side is reconstructed from per-subspace centroids) — no
    * per-row vector arithmetic, the whole scoring pass is one
    * codegen-friendly projection over the codes column.
    *
    * Standard scale pipeline: ADC shortlist over ALL codes (cheap,
    * in-memory-sized corpus representation) → exact re-rank of the
    * shortlist against the full vectors (a partition-pruned or id-joined
    * fetch of `shortlist` rows). [[topK]] implements exactly that.
    *
    * Sub-quantizers train per subspace via the shared seeded Lloyd's on a
    * bounded driver sample — deterministic for a given (seed, input
    * layout). With `exact = true` (round-18) the sub-quantizers train
    * with the integer micro-unit Lloyd from the md5-ordered sample
    * instead (the q36/q118 move), making codebooks — and therefore
    * encode, ADC shortlist and re-rank — DuckDB-replayable. */
  final case class Pq(m: Int = 8, nCodes: Int = 16, seed: Long = 42L,
                      maxSample: Int = DefaultTrainSample, exact: Boolean = false) {

    /** codebooks(i)(c) = centroid c of subspace i, trained over the
      * NORMALIZED vectors so ADC approximates cosine. */
    def train(embeddings: DataFrame, idCol: String = "vec_id",
              vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
      val normed = normalize(embeddings, idCol, vecCol)
      val sample =
        if (exact) hashOrderedSample(normed, maxSample)
        else normed.select(col("v")).limit(maxSample)
          .collect().map(_.getSeq[Double](0).toArray)
      require(sample.nonEmpty, "cannot train PQ codebooks on an empty table")
      val dim = sample.head.length
      require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
      val sub = dim / m
      if (exact)
        // exactLloydDriver inits cq = pts.take(nCodes) and indexes all
        // nCodes cells each round; a short sample would AIOOBE opaquely
        // (the float path degrades via take(min(k, n)) instead).
        require(sample.length >= nCodes,
          s"PQ exact training needs >= $nCodes sample vectors, got ${sample.length}")
      if (exact)
        Array.tabulate(m)(i =>
          exactLloydDriver(sample.map(_.slice(i * sub, (i + 1) * sub)),
            nCodes, iters = LloydIters))
      else
        Array.tabulate(m)(i =>
          lloyd(sample.map(_.slice(i * sub, (i + 1) * sub)), nCodes,
            seed + i, iters = LloydIters))
    }

    /** (vec_id, codes array<int>): nearest sub-centroid per subspace,
      * assigned distributedly by the native nearest-centroid kernel over
      * array slices — one projection, no shuffle. */
    def encode(codebooks: Array[Array[Array[Double]]], embeddings: DataFrame,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
      val sub = codebooks.head.head.length
      graft.plans.NearestCentroid.register(embeddings.sparkSession)
      normalize(embeddings, idCol, vecCol)
        .select(col("vec_id"),
          array((0 until m).map(i =>
            graft.plans.NearestCentroid.assign(
              slice(col("v"), i * sub + 1, sub), codebooks(i))): _*).as("codes"))
    }

    /** ADC scores for query `qv` over a codes frame: the m×nCodes lookup
      * table (inner product of each query sub-vector with each
      * sub-centroid) is computed on the driver and shipped as ONE flat
      * array literal; each row's score is m element_at lookups folded by
      * `aggregate` — fully codegen'd, no join. */
    def adcScores(codebooks: Array[Array[Array[Double]]], codes: DataFrame,
                  qv: Array[Double]): DataFrame = {
      val n = math.sqrt(qv.map(x => x * x).foldLeft(0.0)(_ + _))
      val qn = qv.map(_ / n)
      val sub = codebooks.head.head.length
      val flat: Seq[Double] = for {
        i <- 0 until m
        cb <- codebooks(i)
      } yield cb.zip(qn.slice(i * sub, (i + 1) * sub))
        .map { case (c, q) => c * q }.foldLeft(0.0)(_ + _)
      codes.select(col("vec_id"),
        aggregate(
          transform(col("codes"), (c, i) =>
            element_at(typedLit(flat), (i * nCodes + c + 1).cast("int"))),
          lit(0.0), (acc, x) => acc + x).as("adc"))
    }

    /** Top-k: ADC shortlist (size `shortlist`) → exact cosine re-rank of
      * the survivors against the full vectors. Output matches the other
      * ANN paths: (vec_id, cosine). */
    def topK(codebooks: Array[Array[Array[Double]]], codes: DataFrame,
             embeddings: DataFrame, qv: Array[Double], k: Int = 10,
             shortlist: Int = 100, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
      val n = math.sqrt(qv.map(x => x * x).foldLeft(0.0)(_ + _))
      val qn = qv.map(_ / n).toSeq
      val short = adcScores(codebooks, codes, qv)
        .orderBy(col("adc").desc, col("vec_id").asc)
        .limit(shortlist)
        .select(col("vec_id"))
      normalize(embeddings, idCol, vecCol)
        .join(broadcast(short), "vec_id")
        .withColumn("cos", dotProduct(col("v"), typedLit(qn)))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(k)
        .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
    }
  }
}
