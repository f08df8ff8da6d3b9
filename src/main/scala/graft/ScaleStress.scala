package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Manual scale probe (not part of the driver contract).
  *
  * Default mode (round-8 verdict ask, extended per round 10): run the
  * nastiest dedup shapes with adversarial hot spots planted — a DENSE
  * duplicate cluster for LSH groups, a HOT sign-LSH bucket for semantic
  * dedup, a shared-boilerplate DF SPIKE for n-gram Jaccard — plus q92's
  * fact-scaled PageRank derivation, at 1×/10× and (for q50/q22/q92, the
  * round-10 ask) 100× ≈ a sf1-scale fact side. Emits `SCALE_r11.json`
  * recording rows-in / rows-out / wall-time per scale, so the
  * sub-quadratic claims are measured per round, not re-argued from
  * plan-reading. A shape scales sub-quadratically when
  * wall(10×)/wall(1×) ≪ 100 (quadratic would be ~100×).
  *
  * `runMain graft.ScaleStress` — three-shape artifact;
  * `runMain graft.ScaleStress full [replication]` — also the legacy
  * operator probe list at ~100k docs. */
object ScaleStress {

  final case class ShapeRun(rowsIn: Long, rowsOut: Long, wallSec: Double)

  def main(args: Array[String]): Unit = {
    val runFull = args.headOption.contains("full")
    val rep = args.drop(if (runFull) 1 else 0).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---------------------------------------------------- three-shape artifact
    val docsBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def timed(rowsIn: Long)(f: => Long): ShapeRun = {
      val t0 = System.nanoTime()
      val out = f
      val r = ShapeRun(rowsIn, out, (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
      r
    }

    /** Near-dup replicas (tail mutation) + a DENSE cluster: `hot` extra
      * copies of doc 0 with tiny per-copy tails — one pathological
      * duplicate group far denser than anything organic. */
    def stressDocs(k: Int, hot: Int): org.apache.spark.sql.DataFrame = {
      val replicas = docsBase
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("doc_id") * k + col("rep")).as("doc_id"),
          concat(col("text"), lit(" tail"), col("rep")).as("text"))
      val dense = docsBase.filter(col("doc_id") === 0)
        .crossJoin(spark.range(hot).select(col("id").as("rep")))
        .select((lit(90000000L) + col("rep")).as("doc_id"),
          concat(col("text"), lit(" hot"), col("rep") % 3).as("text"))
      replicas.unionByName(dense).repartition(32)
    }

    /** Corpus growth at CONSTANT duplication density: the x10 spike corpus
      * (50k docs — its near-dup clone families and boilerplate spike intact)
      * plus unique filler documents up to k×5000 total. Every filler token
      * is chased by a per-document marker token, so every filler shingle
      * contains the marker and has df = 1: filler contributes ZERO candidate
      * pairs, only the linear work (tokenize, shingle, bucket shuffle) a
      * bigger corpus adds. Whole-corpus replication is the WRONG probe at
      * x100: it multiplies every clone family by k, so the TRUE pair count
      * grows O(k²) in the data itself — any exact pair-emitting operator
      * pays billions of intermediate rows (the first x100 attempt filled
      * 80 GB of shuffle spill) no matter how good the plan is. Real corpora
      * grow mostly-unique; the question that matters at 100 TB is whether
      * wall stays ~linear in corpus size when duplication density is flat. */
    def constDensityDocs(k: Int): org.apache.spark.sql.DataFrame = {
      val filler = docsBase
        .crossJoin(spark.range(k - 10).select(col("id").as("rep")))
        .select((lit(10000000L) + col("doc_id") * (k - 10) + col("rep")).as("fid"),
          col("text"))
        .select(col("fid").as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(" u"), col("fid").cast("string"))), " ").as("text"))
      spikeDocs(10).unionByName(filler).repartition(32)
    }

    /** Perturbed replicas + a HOT bucket: `hot` exact copies of vector 0
      * (cosine 1.0 with each other — they all land in one sign-LSH bucket
      * and one component). Per-dim phase noise keeps replica cosines off
      * 1.0 so they are candidates, not trivial dups. */
    def stressVecs(k: Int, hot: Int): org.apache.spark.sql.DataFrame = {
      val replicas = embBase
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("vec_id") * k + col("rep")).as("vec_id"),
          expr("transform(embedding, (x, i) -> " +
            "x + float(0.05) * float(rep) * float(cos(i + rep)))").as("embedding"))
      val dense = embBase.filter(col("vec_id") === 0)
        .crossJoin(spark.range(hot).select(col("id").as("rep")))
        .select((lit(90000000L) + col("rep")).as("vec_id"), col("embedding"))
      replicas.unionByName(dense).repartition(32)
    }

    /** Boilerplate DF spike: every third doc gets the same 40-token
      * preamble — shared shingles with document frequency ≈ corpus/3 that
      * the df cap MUST prune or the candidate join goes quadratic. */
    def spikeDocs(k: Int): org.apache.spark.sql.DataFrame = {
      val boiler = (1 to 40).map(i => s"boilerplate$i").mkString(" ")
      stressDocs(k, hot = 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(lit(boiler + " "), col("text")))
            .otherwise(col("text")).as("text"))
    }

    def measure(name: String, label: String,
                mk: () => org.apache.spark.sql.DataFrame,
                run: org.apache.spark.sql.DataFrame => Long,
                warm: Boolean = true): (String, ShapeRun) = {
      val df = mk()
      val rows = df.count()
      // warm-up: JIT + FS metadata out of the measured pass. Skipped at the
      // biggest scale — the smaller scales of the same shape already warmed
      // the code paths, and a second x100 pass doubles a minutes-long run.
      if (warm) { run(df); spark.catalog.clearCache() }
      val r = timed(rows)(run(mk()))
      println(f"[stress] $name $label: in=${r.rowsIn} out=${r.rowsOut} " +
        f"wall=${r.wallSec}%.1fs")
      label -> r
    }

    def shape(name: String, scales: Seq[Int],
              mk: Int => org.apache.spark.sql.DataFrame,
              run: org.apache.spark.sql.DataFrame => Long): (String, () => Map[String, ShapeRun]) =
      name -> (() => scales.map(k =>
        measure(name, s"x$k", () => mk(k), run, warm = k < 100)).toMap)

    // q92's scale axis is the FACT TABLE feeding the edge derivation: the
    // nation graph itself is fixed-size (25 vertices, ≤625 edges) at any
    // data scale — exactly the 100 TB shape, where more lineitem rows mean
    // a heavier distributed derivation in front of the same tiny rank
    // loop. x100 is ~60M join-side rows ≈ a sf1-scale fact table, the
    // round-10 verdict's asked-for amortization point: the per-action
    // scheduling floor (1.7s of q92's 3.4s at sf0.1) should shrink
    // relative to total as derivation work grows.
    val ordersDim = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val custDim = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val suppDim = spark.read.parquet("/root/testdata/sf0.1/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nationDim = spark.read.parquet("/root/testdata/sf0.1/nation.parquet")
      .select(col("n_nationkey").as("id"))
    // q121's fixed tokenizer: 8 rules learned once on the 1x corpus
    lazy val encodeRules: Seq[(String, String)] =
      graft.operators.BpeTrain.learnMerges(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet"), 8)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    def stressLineitem(k: Int): org.apache.spark.sql.DataFrame =
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"))
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select(col("l_orderkey"), col("l_suppkey"))
        .repartition(32)
    def q92Run(li: org.apache.spark.sql.DataFrame): Long = {
      val edges = li
        .join(ordersDim, col("l_orderkey") === col("o_orderkey"))
        .join(custDim, col("o_custkey") === col("c_custkey"))
        .join(suppDim, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .distinct()
      graft.operators.Graph.pagerank(nationDim, edges, iterations = 5).count()
    }

    val shapes = Seq(
      shape("q50_lsh_groups_dense_cluster", Seq(1, 10, 100),
        k => stressDocs(k, hot = 300),
        df => TextDedup.minhashLshGroups(df).count()),
      // q78 runs under BOTH dense-bucket policies (the q22 two-policy
      // pattern): x1/x10 use the declared query's escalation default —
      // a hot bucket past the cap emits the verified star+chain spanning
      // set, never its quadratic pair set — while x10_exact documents
      // what the same corpus costs with the cap off (every hot-bucket
      // pair materialized). The hot cluster GROWS with the corpus
      // (hot = 300·k): a viral near-dup cluster scales with the crawl,
      // and a constant-size cluster would quietly fall under the cap at
      // every scale and prove nothing.
      "q78_semantic_dedup_hot_bucket" -> { () =>
        def run(cap: Int)(df: org.apache.spark.sql.DataFrame): Long =
          graft.operators.Similarity
            .semanticDedupGroups(df, threshold = 0.3, denseBucketCap = cap)
            .count()
        val cap = graft.operators.Similarity.DefaultDenseBucketCap
        Map(
          measure("q78_semantic_dedup_hot_bucket", "x1_exact",
            () => stressVecs(1, hot = 300), run(0)),
          measure("q78_semantic_dedup_hot_bucket", "x1",
            () => stressVecs(1, hot = 300), run(cap)),
          measure("q78_semantic_dedup_hot_bucket", "x10",
            () => stressVecs(10, hot = 3000), run(cap)),
          measure("q78_semantic_dedup_hot_bucket", "x10_exact",
            () => stressVecs(10, hot = 3000), run(0), warm = false),
          // r17 verdict #6: the 100× PLANTED row. Background stays 1× —
          // whole-corpus replication at 0.3-threshold has a Θ(n²) TRUE
          // pair set by construction (the r16 x10 analysis: 2.67M
          // verified pairs), which measures output volume, not the
          // hot-bucket policy. Holding the corpus at 1× and growing ONLY
          // the planted clique 300 → 30,000 isolates the claim: the
          // capped policy emits the 2(m−1) spanning set, so a 100×
          // clique should cost low-single-digit × the x1_hot wall
          // (compare against x1, same background; cap-off on this
          // corpus would be 450M pairs — documented by x10_exact, not
          // re-paid here).
          measure("q78_semantic_dedup_hot_bucket", "x100_hot_capped",
            () => stressVecs(1, hot = 30000), run(cap), warm = false))
      },
      shape("q92_pagerank_fact_scale", Seq(1, 10, 100),
        stressLineitem, q92Run),
      // q22 runs under BOTH cap policies. The synthetic corpus draws
      // shingles from a small phrase pool, so at 10× replication nearly
      // every shingle's document frequency crosses the fixed cap of 20
      // and gets pruned — pairs collapse 186 → 0. That is the measured
      // recall cliff of an ABSOLUTE df cap under corpus growth (the cap
      // is fan-out control, and fan-out is relative to corpus size): at
      // scale the cap must grow with the corpus. The x10/x100 rows use
      // the DERIVED cap — `dfCapFor(count)`, the policy the declared q22
      // runs since round 11 — proving pair recall survives replication;
      // x10_fixed_cap documents the cliff the fixed policy had.
      "q22_ngram_jaccard_df_spike" -> { () =>
        def derivedCapRun(df: org.apache.spark.sql.DataFrame): Long = {
          val cached = df.cache()
          // deliberate opt-in past the round-17 pair-volume guard: these
          // rows MEASURE the dense regime the guard exists to flag
          try TextDedup.ngramJaccardPairs(cached,
            maxShingleDf = TextDedup.dfCapFor(cached.count()),
            maxPairsPerBucket = Long.MaxValue).count()
          finally cached.unpersist()
        }
        Map(
          measure("q22_ngram_jaccard_df_spike", "x1",
            () => spikeDocs(1), derivedCapRun),
          measure("q22_ngram_jaccard_df_spike", "x10_fixed_cap",
            () => spikeDocs(10),
            df => TextDedup.ngramJaccardPairs(df).count()),
          measure("q22_ngram_jaccard_df_spike", "x10",
            () => spikeDocs(10), derivedCapRun),
          // x100 = constant-density growth (see constDensityDocs): rows_out
          // should match x10's pair count and wall should stay ~linear in
          // corpus size — the claim that matters at 100 TB
          measure("q22_ngram_jaccard_df_spike", "x100",
            () => constDensityDocs(100), derivedCapRun, warm = false),
          // guard row: at DEFAULT settings the x100 corpus's densest
          // in-cap shingle buckets (~655 docs, measured) exceed the
          // 200k-pair per-bucket ceiling and the operator must refuse
          // loudly (rows_out 1 = guard engaged). Round-18 trade note: the
          // guard now checks ACTUAL bucket sizes in-plan (the advisor fix
          // — the old worst-case require also rejected every HEALTHY
          // corpus past ~158k docs), so the trip fires when the dense
          // bucket is reached at runtime, near the end of the bucket
          // stage — this corpus pays most of one linear pipeline pass
          // before refusing. A per-bucket cap cannot pre-empt this
          // corpus's real cost anyway (90M of its pairs come from
          // buckets UNDER the 632-doc threshold); the cap's job at
          // 100 TB is refusing the unbounded single-bucket blowup, and
          // the refusal is never worse than ~1× of the detonation it
          // prevents downstream.
          measure("q22_ngram_jaccard_df_spike", "x100_guard_engaged",
            () => constDensityDocs(100), df => {
              val cached = df.cache()
              def tripped(t: Throwable): Boolean =
                t != null && (Option(t.getMessage)
                  .exists(_.contains("maxPairsPerBucket")) || tripped(t.getCause))
              try {
                val trip =
                  try {
                    TextDedup.ngramJaccardPairs(cached,
                      maxShingleDf = TextDedup.dfCapFor(cached.count())).count()
                    0L
                  } catch { case e: Exception if tripped(e) => 1L }
                require(trip == 1L,
                  "pair-volume guard did NOT engage on the df-spike corpus")
                trip
              } finally cached.unpersist()
            }, warm = false))
      },
      // q100: span-level dedup under the dense-cluster stress. Output is
      // per-document (occurrence rows, never pairs), so replication should
      // cost ~linear wall even though every clone-family gram bucket is
      // k× bigger — the claim that separates the k-gram bucket design
      // from a pair-emitting formulation.
      shape("q100_span_dedup_dense_cluster", Seq(1, 10),
        k => stressDocs(k, hot = 300),
        df => graft.operators.SpanDedup.duplicateSpans(df).count()),
      // q102: the incremental-index claim measured. Probe a FIXED incoming
      // batch (5k near-dup docs) against a 1× vs 10× indexed corpus —
      // the probe never re-reads corpus text, so its wall should grow far
      // slower than the index (only the band join's build side grows) —
      // and against the x10_recompute row, which pays from-scratch
      // minhash over corpus+batch: the cost the index exists to avoid.
      // q110: BPE training's scale claim measured — the merge loop runs
      // on the vocab-sized word dict, and replication does not grow the
      // vocabulary (replicas share words, only counts scale), so 10× data
      // should cost little more than the one extra corpus-pass: the
      // wall factor is the proof that training is dict-bound, not
      // corpus-bound.
      shape("q110_bpe_train_corpus_scale", Seq(1, 10),
        k => stressDocs(k, hot = 0),
        df => graft.operators.BpeTrain.learnMerges(df, numMerges = 8).count()),
      // q121: BPE ENCODE's scale claim — the kernel chain runs on the
      // distinct-word dict, and replication grows counts, not vocabulary,
      // so 10× data should cost ~the extra corpus pass (scan-bound) with
      // a constant-size dict join-back. Rules are FIXED (learned once on
      // the 1× corpus): the operational shape — a tokenizer is trained
      // rarely and applied to every new crawl.
      shape("q121_bpe_encode_corpus_scale", Seq(1, 10),
        k => stressDocs(k, hot = 0),
        df => graft.operators.BpeTrain.encode(df, encodeRules).count()),
      // q115: PMI mining under replication — the bigram/unigram model
      // tables are vocabulary-bounded, so 10× rows mean linearly more
      // exploded counting into the SAME aggregate keys (map-side combine
      // absorbs it) and an unchanged survivor set to rank.
      shape("q115_pmi_corpus_scale", Seq(1, 10),
        k => stressDocs(k, hot = 0),
        df => graft.operators.TermWeighting
          .pmiCollocations(df, minCount = 5, topK = 50).count()),
      // q59: PII scrub is pure per-row regex — the 100 TB claim is
      // embarrassing parallelism (wall ~ rows / cores), which r12's 14×
      // sf1 factor contradicted because the single-split scan pinned all
      // regex on one thread. The shape replays the declared query's
      // injection + scrub (counts consumed THROUGH clean_text's length so
      // Catalyst cannot prune the replace passes) over 1×/10× docs; the
      // rebalance added in round 13 should hold the wall factor ~linear.
      shape("q59_pii_scrub_row_scale", Seq(1, 10),
        k => stressDocs(k, hot = 0),
        { df =>
          val injected = df.withColumn("text",
            concat(col("text"),
              lit(" contact: user"), (col("doc_id") % 100).cast("string"),
              lit("@example.com via https://ex.com/p/"), col("doc_id").cast("string")))
          val par = spark.sparkContext.defaultParallelism
          val balanced =
            if (injected.rdd.getNumPartitions < par) injected.repartition(par)
            else injected
          graft.operators.TextClean.scrubPii(balanced, col("text"))
            .select((length(col("clean_text")) +
              col("n_emails") + col("n_urls") + col("n_phones")).as("w"))
            .agg(sum(col("w"))).count()
        }),
      // q132: DSIR importance weights under replication — the bucket
      // model is FIXED-SIZE (256 rows) at any corpus, so 10× rows mean
      // linearly more (doc, bucket) tf rows flowing through the same
      // broadcast-scored aggregates; the wall factor should track rows
      // (never vocabulary), the claim that distinguishes hashed features
      // from a vocabulary-keyed model at 100 TB.
      shape("q132_dsir_corpus_scale", Seq(1, 10),
        k => stressDocs(k, hot = 0),
        df => graft.operators.DataSelection
          .dsirWeights(df, col("doc_id") % 2 === 0).count()),
      // q89: the exact-GD classifier's scale rows (r18 verdict #7).
      // Training is full-batch GD over a HASH-FRACTION sample — each of
      // the 6 epochs is one pass over fraction × corpus, so at a FIXED
      // fraction wall is ~linear in corpus size (the "sample capped at
      // 65,536" premise applies to the Lloyd trainers below, not GD).
      // The 100 TB lever is the fraction itself: x10_frac_scaled trains
      // the x10 corpus at fraction/10 — the same ABSOLUTE sample as x1 —
      // so its wall should sit near x1's plus the unavoidable linear
      // feature+scoring scans, proving training cost tracks sample rows,
      // not corpus rows, with no hidden superlinear term.
      "q89_classifier_corpus_scale" -> { () =>
        import graft.operators.QualityClassifier
        def run(frac: Double)(df: org.apache.spark.sql.DataFrame): Long = {
          val docs = df.withColumn("n_chars", length(col("text")))
          val label = col("n_chars") >= 300
          val tokCount = Seq(
            size(split(trim(col("text")), "\\s+")).cast("double") / 10.0)
          val feats = QualityClassifier
            .hashFeaturesExact(docs, label, dim = 256, denseExprs = tokCount)
            .persist()
          try {
            val m = QualityClassifier.trainExactReplay(feats, dim = 256,
              denseDims = 2, epochs = 6, learningRate = 1.0,
              sampleFraction = frac)
            QualityClassifier.scoreExact(docs, m, denseExprs = tokCount).count()
          } finally { feats.unpersist(): Unit }
        }
        Map(
          measure("q89_classifier_corpus_scale", "x1",
            () => stressDocs(1, hot = 0), run(0.5)),
          measure("q89_classifier_corpus_scale", "x10",
            () => stressDocs(10, hot = 0), run(0.5)),
          measure("q89_classifier_corpus_scale", "x10_frac_scaled",
            () => stressDocs(10, hot = 0), run(0.05), warm = false))
      },
      // q98: the exact PQ sub-quantizer training's scale rows (r18
      // verdict #7). The md5-ordered sample is capped at 65,536 vectors:
      // x1/x10 (2k/20k) grow the sample with the corpus, x100 (200k)
      // binds the cap — so the x100/x10 wall factor should read ~the
      // 65536/20000 sample ratio (~3), NOT ~10: past the cap, training
      // cost is flat in corpus size and only the ORDER BY sample draw
      // scales. rows_out = the 16 × 16 trained centroids.
      "q98_pq_train_corpus_scale" -> { () =>
        import graft.operators.Similarity
        def trainRun(df: org.apache.spark.sql.DataFrame): Long = {
          val pq = Similarity.Pq(m = 16, nCodes = 16, exact = true)
          pq.train(df).map(_.length.toLong).sum
        }
        Map(
          measure("q98_pq_train_corpus_scale", "x1",
            () => stressVecs(1, hot = 0), trainRun),
          measure("q98_pq_train_corpus_scale", "x10",
            () => stressVecs(10, hot = 0), trainRun),
          measure("q98_pq_train_corpus_scale", "x100",
            () => stressVecs(100, hot = 0), trainRun, warm = false))
      },
      "q102_incremental_probe" -> { () =>
        def batch = docsBase.select((col("doc_id") + 80000000L).as("doc_id"),
          concat(col("text"), lit(" probe")).as("text"))
        def probeAt(k: Int): (String, ShapeRun) = {
          val dir = graft.util.Fs.scratchDir(s"graft-scale-idx$k").toString + "/ix"
          TextDedup.buildLshIndex(stressDocs(k, hot = 0), dir) // amortized, untimed
          measure("q102_incremental_probe", s"x$k", () => batch,
            df => TextDedup.probeLshIndex(df, dir).count(), warm = false)
        }
        Map(probeAt(1), probeAt(10),
          measure("q102_incremental_probe", "x10_recompute",
            () => stressDocs(10, hot = 0).unionByName(batch),
            df => TextDedup.minhashLshPairs(df).count(), warm = false))
      },
      // q83: does the salt ever WIN? (round-11 verdict ask #5 — the
      // operator was declared with oracle == plain join but no evidence
      // the rewrite helps.) A planted hot key holds 95% of a 16M-row
      // fact; the dim side is 1k keys. Broadcast is disabled (the salt's
      // documented use case is the shuffle-join path: a broadcastable dim
      // needs no salt) and AQE's skew-join split is disabled (the
      // operator exists precisely for where AQE can't reach — cached
      // exchanges, or a single key AQE re-concentrates). Unsalted, the
      // hot key's entire 15.2M rows land on ONE reducer; salted across 32
      // sub-keys they spread over every core. The artifact rows are the
      // A/B walls — salted should win by roughly the core count's worth
      // of the hot task.
      "q83_salted_join_hot_key" -> { () =>
        val nFact = 16000000L
        val nDim = 1000L
        def fact = spark.range(nFact).select(
          when(col("id") % 20 =!= 0, lit(7L))
            .otherwise(col("id") % nDim).as("k"),
          col("id").as("payload"))
        def dim = spark.range(nDim)
          .select(col("id").as("k"), (col("id") * 3).as("dval"))
        // head(), not count(): the 1-row global agg's COUNT is known
        // without its value — forcing the sum itself keeps the join
        // un-prunable under any future optimizer
        def agg(j: org.apache.spark.sql.DataFrame): Long =
          j.agg(sum(col("payload") + col("dval")).as("s")).head().getLong(0)
        val confs = Seq(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.skewJoin.enabled" -> "false",
          "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
        val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try Map(
          measure("q83_salted_join_hot_key", "unsalted",
            () => fact, df => agg(df.join(dim, Seq("k")))),
          measure("q83_salted_join_hot_key", "salted_32",
            () => fact, df => agg(graft.operators.SkewJoin
              .saltedJoin(df, dim, Seq("k"), saltBuckets = 32))),
          // r17: the hot-key split-union variant on the same corpus —
          // only key 7's dim rows replicate (32 rows total); the cold
          // 5% takes the plain join. Should match or beat blanket
          // salting while replicating 1/1000th of the right side.
          measure("q83_salted_join_hot_key", "split_union_32",
            () => fact, df => agg(graft.operators.SkewJoin
              .hotKeySaltedJoin(df, dim, Seq("k"),
                hotThreshold = 100000L, saltBuckets = 32))))
        finally olds.foreach { case (k, o) =>
          o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      })

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", v)
    // per-round artifact name so a later round's run never silently
    // overwrites an earlier round's committed evidence
    // A filtered local run (SPARK_GRAFT_SCALE_SHAPES) must not overwrite
    // the round's full-battery artifact with its subset — r12 committed a
    // SCALE json holding ONE shape under a note describing the whole
    // battery (advisor). Filtered runs write to a `.partial` sibling
    // unless an explicit SPARK_GRAFT_SCALE_OUT says otherwise.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      if (sys.env.contains("SPARK_GRAFT_SCALE_SHAPES")) "SCALE_partial.json"
      else "SCALE_r19.json")
    def writeArtifact(done: Seq[(String, Map[String, ShapeRun])]): Unit = {
      val json = done.map { case (name, runs) =>
        val body = runs.toSeq.sortBy(_._1).map { case (k, r) =>
          s""""$k":{"rows_in":${r.rowsIn},"rows_out":${r.rowsOut},"wall_sec":${num(r.wallSec)}}"""
        }.mkString(",")
        // scale factors only when the shape ran the standard x1/x10 axis
        // (custom-label shapes like the q83 salt A/B carry none)
        val factor = for { a <- runs.get("x10"); b <- runs.get("x1") } yield
          s""","wall_factor_10x":${num(a.wallSec / math.max(b.wallSec, 1e-9))}"""
        val f100 = for { a <- runs.get("x100"); b <- runs.get("x1") } yield
          s""","wall_factor_100x":${num(a.wallSec / math.max(b.wallSec, 1e-9))}"""
        s""""$name":{$body${factor.getOrElse("")}${f100.getOrElse("")}}"""
      }.mkString("{", ",", s""","note":"wall_factor_10x ~10 is linear, ~100 quadratic; wall_factor_100x ~100 linear, ~10000 quadratic; q22 x100 holds duplication density constant (unique filler docs), so rows_out tracks x10 and ~linear wall is the pass condition; q22 x100_guard_engaged: rows_out 1 = default pair-volume guard refused the dense corpus; q78 x100_hot_capped grows ONLY the planted clique 100x over the x1 background (compare wall vs x1); q83 compares unsalted vs blanket-salted vs hot-key-split-union wall on a planted 95%-hot key with AQE skew handling disabled (the operator's documented use case); q89 x10_frac_scaled trains the x10 corpus at fraction/10 = the x1 absolute sample (training cost tracks sample rows); q98 x100 binds the 65536-vector training-sample cap (expect x100/x10 ~3, the sample ratio, not ~10)","host_load":"see calibration in BENCH"}""")
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    // run shapes one at a time, flushing the artifact after each so a later
    // shape's failure (OOM, disk) cannot lose earlier evidence — the first
    // x100 attempt died writing 80 GB of spill AFTER 12 minutes of good runs
    val completed = scala.collection.mutable.ArrayBuffer[(String, Map[String, ShapeRun])]()
    // local-iteration filter (comma-separated shape-name substrings): a
    // new shape can run alone instead of re-paying the full battery
    val shapeFilter = sys.env.get("SPARK_GRAFT_SCALE_SHAPES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    shapes.filter { case (name, _) =>
      shapeFilter.forall(_.exists(name.contains)) }
    .foreach { case (name, runShape) =>
      completed += (name -> runShape())
      writeArtifact(completed.toSeq)
      println(s"[stress] flushed $outFile after $name")
    }
    if (!runFull) { spark.stop(); return }

    // ------------------------------------------------------- legacy probes
    val base = docsBase
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
    val layout = graft.util.Fs.scratchDir("stress-merge").toString + "/t"
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
