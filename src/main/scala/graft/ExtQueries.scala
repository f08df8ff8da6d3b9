package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ColumnStats, Multimodal, Similarity, TextAnalysis, TextDedup}

/** Extension query surface: the LLM-training-data operators (dedup family,
  * similarity search, text analysis, multimodal) declared over the
  * `documents` / `embeddings` testdata tables, with DuckDB oracles generated
  * from the same parameters so both engines compute bit-identical md5-based
  * signatures. */
object ExtQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Start a streaming query with its STATE partition count sized to its
    * state volume instead of the session's batch shuffle default: a
    * stateful operator opens one state-store instance per shuffle
    * partition (fixed at first checkpoint), and ~3k windows of state
    * across 32 HDFS-backed stores is ~1s of pure store open/commit
    * overhead per micro-batch (measured). The conf is restored right after
    * `start()` — the stream captured it at planning. Size this UP for
    * genuinely large state (the count is a per-query knob, not a global). */
  private[graft] def withStatePartitions[A](s: SparkSession, n: Int)(start: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val saved = s.conf.get(key)
    s.conf.set(key, n.toString)
    try start finally s.conf.set(key, saved)
  }

  /** Skip the trailing NO-DATA micro-batch for streams whose OUTPUT never
    * depends on watermark advance (round-20, the q82/q96 floor item): an
    * AvailableNow run with a watermark otherwise appends one extra empty
    * micro-batch purely to advance the watermark and evict state —
    * measured ~0.6 s of q82's floor for zero rows. Emission-safe ONLY for
    * operators that emit in the data batch: inner stream-stream joins
    * (matches emit as rows arrive; the flush batch can only emit for
    * OUTER joins) and dropDuplicates (first-seen rows emit immediately;
    * the flush batch only evicts). Append-mode AGGREGATIONS, outer joins
    * and event-time timeouts (q35/q72/q67) emit ON watermark advance and
    * MUST keep the default. State eviction is irrelevant here: the query
    * terminates right after. The conf is restored after `start()` — the
    * stream captured it at planning. */
  private[graft] def withNoDataBatchSkipped[A](s: SparkSession)(start: => A): A = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val saved = s.conf.getOption(key)
    s.conf.set(key, "false")
    try start finally saved match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** State-partition count DERIVED from expected state volume, not
    * hardcoded: ≥`rowsPerPartition` state rows per partition (below that,
    * per-partition store open/commit overhead dominates — measured ~1s
    * per micro-batch across 32 near-empty HDFS-backed stores), clamped to
    * [2, session shuffle partitions] (2 keeps the keyed-state path
    * genuinely distributed; the upper clamp stops a huge estimate from
    * exceeding the session's own parallelism). Callers pass the estimate
    * their query implies — e.g. a stream-stream interval join's state is
    * ~(event rate × horizon) per side — so a 100× corpus automatically
    * gets proportionally more state partitions. */
  private[graft] def statePartitionsFor(s: SparkSession,
                                        expectedStateRows: Long,
                                        rowsPerPartition: Long = 32): Int = {
    val cap = s.conf.get("spark.sql.shuffle.partitions").toInt
    val want = math.ceil(expectedStateRows.toDouble /
      rowsPerPartition.toDouble).toInt
    math.min(math.max(2, want), math.max(2, cap))
  }

  // Shared oracle fragments ------------------------------------------------

  /** DuckDB twin of TextFunctions.shingles (word 3-grams, distinct). */
  private[graft] val shingleCte =
    """toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
       sh AS (SELECT doc_id, unnest(list_distinct(
                [array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 1))])) AS s
              FROM toks)"""

  private[graft] val K = 12 // minhash functions
  private[graft] val BANDS = 4

  /** Twin of [[TextDedup.minhashSignatures]]'s multiply-XOR hashing: one
    * md5 per shingle split into four 28-bit chunks, h_j = XORᵢ c_{j,i}·vᵢ
    * with the same [[TextDedup.mixConst]] constants — every product
    * < 2^57, exact BIGINT arithmetic in both engines. */
  private[graft] def minhashSigSql: String = {
    val chunks = (0 until 4).map(i =>
      s"('0x'||substr(md5(s),${1 + 7 * i},7))::BIGINT AS v$i").mkString(", ")
    val mins = (0 until K).map { j =>
      val h = (0 until 4)
        .map(i => s"((${TextDedup.mixConst(j, i)}*v$i >> 14) & 536870911)")
        .reduce((a, b) => s"xor($a, $b)")
      s"min($h) AS mh$j"
    }.mkString(", ")
    s"""shh AS (SELECT doc_id, $chunks FROM sh),
        sig AS (SELECT doc_id, $mins FROM shh GROUP BY doc_id)"""
  }

  private[graft] def bandSql: String = {
    val rows = K / BANDS
    (0 until BANDS).map { b =>
      val key = (0 until rows).map(r => s"mh${b * rows + r}").mkString("||'|'||")
      s"SELECT doc_id, $b AS band_id, md5($key) AS band_key FROM sig"
    }.mkString(" UNION ALL ")
  }

  // ------------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: canonical doc per content fingerprint.
    "q19_exact_dedup_groups" -> ((s, dir) =>
      TextDedup.exactGroups(t(s, dir, "documents"))),

    // MinHash + LSH banding near-dup candidates.
    "q20_minhash_lsh_pairs" -> ((s, dir) =>
      TextDedup.minhashLshPairs(t(s, dir, "documents"), k = K, bands = BANDS)),

    // LSH dedup groups: connected components over band-bucket collisions —
    // the linear-cost answer for dense duplicate clusters (pair
    // enumeration is quadratic in cluster size; the component is not).
    "q50_lsh_dedup_groups" -> ((s, dir) =>
      TextDedup.minhashLshGroups(t(s, dir, "documents"), k = K, bands = BANDS)),

    // SimHash near-dups at Hamming ≤ 3.
    "q21_simhash_pairs" -> ((s, dir) =>
      TextDedup.simhashPairs(t(s, dir, "documents"))),

    // Gopher-style repetition quality rule (top-bigram share / distinct
    // ratio) — flags boilerplate and looped text.
    "q51_repetition_stats" -> ((s, dir) =>
      TextAnalysis.repetitionStats(t(s, dir, "documents"))),

    // Per-column stats profile (ANALYZE analog): one pass, one row per
    // column. Exact distincts here for oracle parity; the approx (HLL)
    // variant is the 100 TB path.
    "q52_column_profile" -> ((s, dir) =>
      ColumnStats.profile(t(s, dir, "orders"),
        Seq("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"))),

    // Exact n-gram Jaccard over shared-shingle candidates. The df cap is
    // DERIVED from corpus size via [[TextDedup.dfCapFor]] — a fixed cap
    // prunes toward zero recall as the corpus grows (SCALE_r8.json
    // measured pairs 186→0 at 10× replication under cap=20). The count()
    // is parquet footer metadata, not a data scan, so the derivation is
    // O(files) at any corpus size; the oracle mirrors the same formula.
    "q22_ngram_jaccard_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextDedup.ngramJaccardPairs(docs, minJaccard = 0.5,
        maxShingleDf = TextDedup.dfCapFor(docs.count()))
    }),

    // Brute-force cosine top-10 for the vec_id=0 query vector, scored by the
    // native fused-loop Expression (bit-identical to the HOF formulation,
    // which the DuckDB oracle mirrors).
    "q23_embedding_topk" -> ((s, dir) => {
      graft.plans.CosineSimilarity.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= 0), q, k = 10,
        scorer = graft.functions.VectorFunctions.cosineSimilarityNative)
    }),

    // Embedding near-dup pairs (sign-LSH banded, exact re-score ≥ 0.3).
    "q24_embedding_near_dup" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.3)),

    // ANN through the multi-table sign-LSH index (no SQL oracle: rows-only
    // check). The index is built ONCE per (table, params) into a parquet
    // dir partitioned by (table, bucket-group) cell; the query itself is a
    // partition-pruned probe — build cost amortizes across queries exactly
    // as the operator docs promise. TWO hard gates, both memoized per
    // (query, dir, JVM): planted recall == 1.0 (the index's promise — a
    // true near-duplicate is always retrieved) AND corpus recall@10 ≥ 0.5
    // vs the brute-force truth (the DATA-dependent number r11 published at
    // 0.1 under the old single-table config). Round-14 config: 8 tables ×
    // 12 bits with corpus-size-adaptive probe depth (see annLshProbeHFor)
    // measures recall@10 0.9 at sf0.1 / 0.8 at sf1 at scan_frac ~0.16 —
    // the r13 8×4 config had the same recall while reading HALF the corpus.
    "q25_ann_topk" -> ((s, dir) => {
      val lsh = Similarity.SignLsh(nBits = AnnLshBits, dim = 64,
        nTables = AnnLshTables)
      // footer-metadata count, no data scan: decides the probe depth
      val corpusN = t(s, dir, "embeddings").filter(col("vec_id") =!= 0).count()
      val probeH = annLshProbeHFor(corpusN)
      plantedGate("q25_ann_topk", dir) {
        val (corpus, _, plantedIds) = plantedFixture(s, dir)
        val probe = t(s, dir, "embeddings")
          .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        (lsh.topK(lsh.index(corpus), probe, 10, probeHamming = probeH)
          .collect().map(_.getLong(0)).toSet, plantedIds)
      }
      val idx = lsh.loadOrBuild(s,
        t(s, dir, "embeddings").filter(col("vec_id") =!= 0),
        Similarity.IndexStore.pathFor(s, s"$dir/embeddings.parquet",
          s"signlsh_${AnnLshTables}x${AnnLshBits}_64"))
      recallGate("q25_ann_topk", dir, minRecall = 0.5) {
        val truth = Similarity.bruteForceTopK(
          t(s, dir, "embeddings").filter(col("vec_id") =!= 0),
          t(s, dir, "embeddings").filter(col("vec_id") === 0)
            .select(col("embedding").as("qv")), 10)
          .collect().map(_.getLong(0)).toSet
        (lsh.topKPruned(idx, queryVector(s, dir), k = 10,
           probeHamming = probeH)
          .collect().map(_.getLong(0)).toSet, truth)
      }
      lsh.topKPruned(idx, queryVector(s, dir), k = 10,
        probeHamming = probeH)
    }),

    // Language-ID heuristic (marker-count argmax).
    "q26_langid" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"))),

    // Quality features + composite score.
    "q27_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"))),

    // BPE-ish token stats.
    "q28_token_bpe" -> ((s, dir) =>
      TextAnalysis.tokenStats(t(s, dir, "documents"))),

    // Multimodal: binary payload → partition-batched stub decode (the
    // decoder-seam plumbing harness; real decode is q73).
    "q29_multimodal_features" -> ((s, dir) =>
      Multimodal.imageFeatures(
        Multimodal.payloadFromText(t(s, dir, "documents"))).toDF()),

    // Multimodal REAL decode: deterministic PNG tiles (true PNG bytes)
    // generated per doc_id, decoded back with the JDK's javax.imageio —
    // the oracle recomputes width/height/brightness from the generation
    // arithmetic. n_bytes is dropped: PNG encoded size is not
    // SQL-recomputable.
    "q73_image_decode" -> ((s, dir) =>
      Multimodal.imageFeatures(
        Multimodal.pngPayloadFromId(t(s, dir, "documents")),
        Multimodal.ImageIoDecoder)
        .toDF().select("media_id", "width", "height", "brightness")),

    // Structured Streaming on the verified surface: the hourly-window agg
    // run INCREMENTALLY (file-stream source, AvailableNow trigger, complete
    // output) — complete mode makes the final state equal the batch answer,
    // so the q14 oracle applies verbatim.
    "q35_streaming_hourly" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      // stream straight off the source table — no staging copy in the
      // timed path; only the checkpoint lives in a temp dir
      val ckpt = graft.util.Fs.scratchDir("graft-stream-q").toString
      val name = "graft_q35_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = withStatePartitions(s, 8) {
        graft.streaming.EventStreams
          .hourlyWindowedCounts(graft.Tables.loadStream(s, dir, "events"))
          .writeStream.outputMode("complete")
          .format("memory").queryName(name)
          .option("checkpointLocation", s"$ckpt/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
      }
      require(q.awaitTermination(300000),
        "q35 stream did not terminate within 300s")
      s.table(name)
    }),

    // The BOUNDED-STATE form of the streaming windows — the one to copy at
    // scale: append mode + 10-min watermark emits each window exactly once
    // when the watermark closes it, so state is O(open windows) instead of
    // complete mode's O(all windows ever). Deterministic oracle: with
    // AvailableNow the final watermark is max(ts) - 10min (no-data
    // micro-batches flush closed windows), so the emitted set is the batch
    // q14 aggregation restricted to windows whose end <= that watermark.
    "q72_streaming_append" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ckpt = graft.util.Fs.scratchDir("graft-stream-a").toString
      val name = "graft_q72_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = withStatePartitions(s, 8) {
        graft.streaming.EventStreams
          .hourlyWindowedCounts(graft.Tables.loadStream(s, dir, "events"))
          .writeStream.outputMode("append")
          .format("memory").queryName(name)
          .option("checkpointLocation", s"$ckpt/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
      }
      require(q.awaitTermination(300000),
        "q72 stream did not terminate within 300s")
      s.table(name)
    }),

    // Winnowing (rolling-hash) document fingerprints.
    "q37_winnow_fingerprints" -> ((s, dir) =>
      TextDedup.winnowFingerprints(t(s, dir, "documents"))),

    // Containment near-dups: pairs sharing ≥3 winnowed fingerprints —
    // catches copied RUNS (plagiarism shape), complementing MinHash's
    // whole-document similarity. Fingerprints with df > 50 are pruned
    // (fan-out control, same rationale as the Jaccard shingle cap).
    //
    // Shape (round-15, the q22 bucket idiom): candidate pairs come from
    // per-fingerprint doc buckets, NOT a df-join + self-join — ONE
    // groupBy(fingerprint) collects every fingerprint's doc ids, ordered
    // pairs are emitted in place from the sorted bucket, and one pair
    // aggregation counts shared fingerprints. The previous formulation
    // (persist + count + df agg + join back + two-arm self-join) paid
    // three extra stages and a cache round-trip for the identical
    // n_shared. Fingerprints are hash60 longs end to end.
    //
    // Memory bound (round-16): the collection itself is CAPPED —
    // graft_collect_capped_long stops at 51 elements per group, so a
    // boilerplate fingerprint shared by millions of documents costs 51
    // longs in the aggregation buffer, not an OOM-sized array; the
    // 51-element overflow groups then deterministically fail the 2..50
    // df filter, which is exactly the semantics the exact-df oracle
    // computes. (A plain collect_list put the size filter AFTER an
    // unbounded collection — fine on bench data, wrong at 100 TB.)
    "q44_containment_pairs" -> ((s, dir) => {
      graft.plans.CollectCappedLong.register(s)
      graft.plans.PairCombinations.register(s)
      val fp = TextDedup.winnowFingerprints(t(s, dir, "documents"))
      fp.groupBy(col("fingerprint"))
        .agg(sort_array(graft.plans.CollectCappedLong.of(col("doc_id"), 51)).as("ids"))
        .filter(size(col("ids")).between(2, 50))
        // pair emission via the fused PairCombinations kernel (round-19) —
        // same pairs in the same order as the flatten(transform(slice))
        // chain it replaces (differential-pinned in TextDedupDifferentialSpec)
        .select(call_function("graft_pair_combinations", col("ids")).as("__ps"))
        .select(explode(when(size(col("__ps")) >= 0, col("__ps"))).as("p"))
        .groupBy(col("p.x").as("doc_a"), col("p.y").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
    }),

    // Dead-letter observability: rejects per failure reason.
    "q45_reject_breakdown" -> ((s, dir) => {
      val (_, rejected) = graft.operators.Validate.split(
        t(s, dir, "events"), Queries.eventRulesForOracle)
      rejected.groupBy(col("error_details"))
        .agg(count(lit(1)).as("n_rejects"),
          round(avg(col("value")), 4).as("avg_value"))
    }),

    // IVF ANN (MLlib k-means cells + probed exact re-score). KMeans is
    // deterministic per seed but not reproducible in SQL → rows-only check;
    // retrieval quality is spec-tested against brute force. Training runs
    // ONCE per (table, params): the index persists partitioned by
    // centroid_id and the query probes nProbe pruned cells.
    // Product-quantized ANN (rows-only like q25/q36 — k-means has no SQL
    // oracle; PqSpec pins determinism, compression shape, and planted
    // near-dup retrieval): train sub-quantizers on a bounded sample,
    // encode the corpus to m small codes, ADC-shortlist, exact re-rank.
    // r12 verdict #3: the ADC shortlist now GROWS with the corpus
    // ([[pqShortlistFor]] — a fixed shortlist of 100 was 5% of the sf0.1
    // corpus but 0.5% at sf1, which is exactly where corpus recall@10
    // slid 0.6 → 0.4), and the query carries the same corpus-recall HARD
    // gate q25 got in r12 alongside the planted gate, so a PQ quality
    // regression turns the board red instead of shipping silently.
    // Round-18: exact=true — sub-quantizers train with the integer
    // micro-unit Lloyd from the md5-ordered sample, so the oracle replays
    // training (16 subspaces × 5 rounds), encoding, the ADC shortlist and
    // the exact re-rank: q98 moves from rows-only to hash-green. Recall
    // gates unchanged.
    "q98_pq_topk" -> ((s, dir) => {
      val pq = Similarity.Pq(m = PqM, nCodes = PqCodes, exact = true)
      plantedGate("q98_pq_topk", dir) {
        val (pc, v0, plantedIds) = plantedFixture(s, dir)
        val cbP = pq.train(pc)
        (pq.topK(cbP, pq.encode(cbP, pc), pc, v0.map(_.toDouble), 10,
            shortlist = pqShortlistFor(pc.count()))
          .collect().map(_.getLong(0)).toSet, plantedIds)
      }
      val corpus = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      val shortlist = pqShortlistFor(corpus.count())
      val cb = pq.train(corpus)
      val codes = pq.encode(cb, corpus)
      recallGate("q98_pq_topk", dir, minRecall = 0.8) {
        val truth = Similarity.bruteForceTopK(corpus,
          t(s, dir, "embeddings").filter(col("vec_id") === 0)
            .select(col("embedding").as("qv")), 10)
          .collect().map(_.getLong(0)).toSet
        (pq.topK(cb, codes, corpus, queryVector(s, dir), k = 10,
           shortlist = shortlist)
          .collect().map(_.getLong(0)).toSet, truth)
      }
      pq.topK(cb, codes, corpus, queryVector(s, dir), k = 10,
        shortlist = shortlist)
    }),

    // Round-18: the EXACT training variant (integer micro-unit Lloyd from
    // an md5-ordered init — Similarity.Ivf.trainExact) makes the whole
    // pipeline DuckDB-replayable: the oracle re-trains all 5 rounds from
    // raw parquet (the q118 unrolled-CTE pattern), re-derives the probe
    // cells and re-ranks exactly — q36 moves from rows-only to hash-green.
    // The planted recall gate stays (quality, not identity).
    // Round-19: the (nCentroids, nProbe) config adapts to corpus size —
    // the √N cell rule (see ivfCentroidsFor) replaces the fixed 16/4
    // whose mean-20 recall@10 sat at 0.56 and DECAYED with corpus
    // growth; the oracle re-derives the identical config from count(*).
    "q36_ivf_topk" -> ((s, dir) => {
      val corpus = t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
      val nc = ivfCentroidsFor(corpus.count())
      val np = ivfProbeFor(nc)
      val ivf = Similarity.Ivf(nCentroids = nc, nProbe = np, exact = true)
      plantedGate("q36_ivf_topk", dir) {
        val (pc, _, plantedIds) = plantedFixture(s, dir)
        val (c, i) = ivf.build(pc)
        val probe = t(s, dir, "embeddings")
          .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
        (ivf.topK(c, i, probe, 10)
          .collect().map(_.getLong(0)).toSet, plantedIds)
      }
      val (centers, index) = ivf.loadOrBuild(s, corpus,
        Similarity.IndexStore.pathFor(s, s"$dir/embeddings.parquet",
          s"ivf_exact_${nc}_$np"))
      val q = t(s, dir, "embeddings")
        .filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      ivf.topK(centers, index, q, k = 10)
    })
  )

  /** ANN index configs, shared with Bench's ann_quality section so the
    * published probe-cell count can never drift from what the query runs.
    *
    * 12 bits × 8 tables (round-14, was 8×4): the r13 config probed
    * (1+8+28)/256 of each table's buckets and its union READ HALF THE
    * CORPUS per query (`q25_scan_frac` 0.51) — a 2× index, not an index.
    * Finer buckets with more OR-amplified tables hold the same measured
    * corpus recall@10 (0.9 at sf0.1, 0.8 at sf1, planted 1.0 everywhere)
    * at scan_frac 0.16–0.17. Full sweep on the real corpora:
    * 8×4 H2 = recall .90/scan .51; 12×6 H2 = .60/.13; 12×8 H2 = .90/.16;
    * 14×8 H2 = .60/.06 — 12×8 is the knee. */
  private[graft] val AnnLshBits = 12
  private[graft] val AnnLshTables = 8
  /** Probe depth adapts to corpus size — the standard multi-probe recall
    * knob. Tiny corpora (< 2000 vectors) probe Hamming≤3: their bucket
    * occupancy is a handful of vectors, so recall needs a wider ball and
    * the extra scan is a few hundred rows (measured at the 500-vector
    * test corpora: H2 recall@10 = 0.4–0.5, H3 = 0.7–0.9 at scan_frac
    * ~0.42 — of 500 rows). From ~2000 vectors up the ball tightens to
    * Hamming≤2, where 8×12-bit measures recall 0.9 (2k vectors, sf0.1) /
    * 0.8 (20k, sf1) at scan_frac 0.16–0.17. Call sites derive the corpus
    * size from a one-column filtered count (`vec_id =!= 0`), cheap at any
    * scale. The threshold sits at 1000 — midway between the corpus sizes
    * it separates — because the scored
    * corpus EXCLUDES the query vector (sf0.1's 2000 rows score as 1999;
    * a threshold at exactly 2000 put sf0.1 in the wide-ball branch and
    * published scan_frac 0.45 for a corpus the tight ball serves at
    * 0.16 with recall 0.9). */
  private[graft] def annLshProbeHFor(corpusRows: Long): Int =
    if (corpusRows < 1000L) 3 else 2
  /** IVF cell count — the standard √N rule (FAISS sizing guidance:
    * nlist ∝ √N) at 3·√N, the knee of the round-19 sweep on the
    * isotropic test embeddings, floored for tiny corpora and CAPPED at
    * 256 where the bounded driver-side exact trainer stops being the
    * right tool (past it, train distributedly —
    * `Clustering.lloydAssignExact` is the same integer-carry round).
    * Measured mean-20 recall@10 at ~0.3 scan fraction (IvfSweep):
    * sf0.1 (n=1999): 16/4 = 0.58, 89/26 = 0.76, 134/40 = 0.805;
    * sf1 (n=19999): 16/4 = 0.565, 128/38 = 0.765, 256/76 = 0.83 —
    * at FIXED cell count recall decays with corpus size on isotropic
    * gaussians (near-orthogonal "neighbors" spread uniformly over
    * cells), so the cell count must grow with the corpus. Every
    * ingredient (count, sqrt, one multiply, floor) is exact or
    * correctly-rounded IEEE, so the oracle re-derives the identical
    * config in SQL and q36 stays hash-green. */
  private[graft] def ivfCentroidsFor(corpusRows: Long): Int =
    math.min(256, math.max(16, (3.0 * math.sqrt(corpusRows.toDouble)).toInt))

  /** Probe depth = 30% of the cells (floor 4): holds the published scan
    * fraction at ~0.3 across corpus sizes while the √N cell rule buys
    * the recall. (0.3·k is one IEEE multiply — both engines truncate the
    * same double.) */
  private[graft] def ivfProbeFor(nCentroids: Int): Int =
    math.max(4, (0.3 * nCentroids).toInt)
  /** 16 subspaces × 4-bit codes = 64 bits/vector — the same code budget
    * as textbook PQ8×8 but with 16-centroid codebooks, which still train
    * on the 49-vector sf0.001 sample (256-centroid books cannot). r17
    * sweep at sf0.1, shortlist 100 (scan_frac 0.05): (8,16) 0.6 →
    * (16,16) 0.9 recall@10 — finer subspaces beat more codes at fixed
    * bits on these 64-dim embeddings. */
  /** Test-embedding dimensionality (TESTDATA.md: 64-dim float vectors at
    * every SF). Oracle builders derive sub-space widths from this instead
    * of a bare 64 literal; the operators themselves read dim from data. */
  private[graft] val EmbeddingDim = 64
  private[graft] val PqM = 16
  private[graft] val PqCodes = 16
  /** ADC shortlist sized as a FRACTION of the corpus (floor 100): the
    * shortlist is the PQ index's recall knob — ADC ordering only has to
    * surface the true top-k somewhere in the shortlist, and how deep
    * "somewhere" lands scales with corpus size for a fixed code budget.
    * 5% keeps the exact re-rank a small partition-pruned fetch (the scan
    * fraction Bench publishes as `q98_scan_frac`) while holding
    * recall@10 ≥ 0.5 at every test SF — a fixed 100 was 0.4 at sf1. */
  private[graft] def pqShortlistFor(n: Long): Int =
    math.max(100L, math.ceil(n * 0.05).toLong).toInt

  /** The canonical ANN query vector (vec_id = 0), collected once per call —
    * one row, driver-side by design (probe-set computation is driver work). */
  private[graft] def queryVector(s: SparkSession, dir: String): Array[Double] =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Any](0)
      .map { case f: Float => f.toDouble; case d: Double => d }.toArray

  /** Planted-recall fixture shared by the ANN hard gates below and Bench's
    * `ann_quality` trend numbers (one definition — the published number and
    * the gate can never drift apart): 5 true near-duplicates of the probe
    * (vec_id 0) with small per-dim phase perturbations, appended to the real
    * corpus under sentinel ids. An index that can't retrieve a planted
    * near-duplicate is broken regardless of what the organic corpus looks
    * like (i.i.d. gaussian "nearest" neighbors are near-orthogonal, so
    * corpus recall is data-bounded — planted recall is the index's promise). */
  private[graft] def plantedFixture(s: SparkSession, dir: String)
      : (DataFrame, Array[Float], Set[Long]) = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val v0 = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val planted = (1 to 5).map { p =>
      (90000000L + p, v0.zipWithIndex.map { case (x, d) =>
        x * (1.0f + 0.02f * p * ((d % 3) - 1)) })
    }
    val corpus = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"))
      .union(planted.toDF("vec_id", "embedding"))
    (corpus, v0, planted.map(_._1).toSet)
  }

  /** ANN planted-recall HARD GATE (round-10 verdict ask #6): fails the
    * declared query if the index misses ANY planted near-duplicate, so a
    * recall regression turns the correctness board red instead of shipping
    * as a silently-degraded rows-only result. The gate probes a THROWAWAY
    * in-memory index over corpus+planted — the declared query's own output
    * (real corpus, persisted index) is untouched. Memoized per
    * (query, dir, JVM): Verify runs every query once so the gate always
    * fires there; under Bench the untimed warm-up pass absorbs the gate and
    * the timed passes measure the pure probe, as the bench contract states. */
  private val plantedGateRan =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  private[graft] def plantedGate(name: String, dir: String)(
      run: => (Set[Long], Set[Long])): Unit =
    if (plantedGateRan.add((name, dir))) {
      val (found, planted) = run
      val missed = planted -- found
      if (missed.nonEmpty) {
        plantedGateRan.remove((name, dir)) // keep failing on retry
        throw new IllegalStateException(
          s"$name planted-recall gate: missed ${missed.size}/${planted.size} " +
            s"planted near-duplicates (ids $missed) — index recall regressed")
      }
    }

  /** Corpus-recall HARD GATE (round-11 verdict ask #2): the declared ANN
    * query's own top-k must recover at least `minRecall` of the
    * brute-force truth on the REAL corpus — the data-dependent number the
    * planted gate cannot see (planted near-duplicates sit at cos≈1 and
    * retrieve at Hamming 0 regardless of how useless the index is for
    * organic neighbors; r11 shipped planted==1.0 alongside corpus
    * recall@10 of 0.1). Deterministic for a given (corpus, config), so a
    * failure is a code/config regression, never flakiness. Memoized like
    * [[plantedGate]]. */
  private val recallGateRan =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  private[graft] def recallGate(name: String, dir: String, minRecall: Double)(
      run: => (Set[Long], Set[Long])): Unit =
    if (recallGateRan.add((name, dir))) {
      val (found, truth) = run
      // empty truth would make recall NaN and `NaN < min` false — the gate
      // would silently PASS on a filtered-out corpus; fail loudly instead
      if (truth.isEmpty) {
        recallGateRan.remove((name, dir))
        throw new IllegalStateException(
          s"$name corpus-recall gate: brute-force truth set is EMPTY — " +
            "corpus missing or filtered out; gate cannot be evaluated")
      }
      val recall = found.intersect(truth).size.toDouble / truth.size
      if (recall < minRecall) {
        recallGateRan.remove((name, dir)) // keep failing on retry
        throw new IllegalStateException(
          f"$name corpus-recall gate: recall@${truth.size} = $recall%.2f < " +
            f"$minRecall%.2f vs brute-force truth — index quality regressed")
      }
    }

  // ------------------------------------------------------------------ oracles

  private def minhashOracle: String = {
    val agree = (0 until K)
      .map(j => s"(CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $shingleCte, $minhashSigSql,
        bands AS ($bandSql),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bands a JOIN bands b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, round(($agree) / $K.0, 4) AS est_jaccard
        FROM cand JOIN sig sa ON doc_a = sa.doc_id JOIN sig sb ON doc_b = sb.doc_id"""
  }

  /** Transitive closure over the LSH candidate graph via a recursive CTE —
    * tractable at oracle scale; the Spark side computes the same components
    * by label propagation. */
  /** The q50 group computation as a reusable CTE chain ending in
    * `groups(doc_id, cluster_id)` — q119 composes it with the quality
    * formula. Must follow a `WITH RECURSIVE`. */
  private[graft] def lshGroupsCtes: String =
    s"""$shingleCte, $minhashSigSql,
        bands AS ($bandSql),
        cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                 FROM bands a JOIN bands b
                   ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id <> b.doc_id),
        reach(src, dst) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT reach.src, cand.b FROM reach JOIN cand ON reach.dst = cand.a),
        groups AS (
          SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
          FROM reach GROUP BY src)"""

  private def lshGroupsOracle: String =
    s"""WITH RECURSIVE $lshGroupsCtes
        SELECT doc_id, cluster_id FROM groups"""

  private def simhashOracle: String = {
    val votes = (0 until 60)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")
    val assemble = (0 until 60)
      .map(b => s"(CASE WHEN s$b > 0 THEN 1::BIGINT << $b ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                     FROM documents),
        h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM tok),
        votes AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
        sig AS (SELECT doc_id, $assemble AS simhash FROM votes),
        chunks AS (SELECT doc_id, simhash, c AS chunk_id,
                          (simhash >> (c*15)) & 32767 AS chunk_val
                   FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS c))
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM chunks a JOIN chunks b
          ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"""
  }

  /** DuckDB twin of ColumnStats.profile over the q52 column set: typed
    * min/max then stringified (floats via DECIMAL(28,6) — double→VARCHAR
    * scientific notation is not engine-portable). */
  private def profileOracle: String = {
    def one(c: String, isFloat: Boolean): String = {
      def mm(f: String) =
        if (isFloat) s"CAST(CAST($f($c) AS DECIMAL(28,6)) AS VARCHAR)"
        else s"CAST($f($c) AS VARCHAR)"
      s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
          ${mm("min")} AS min_value, ${mm("max")} AS max_value FROM orders"""
    }
    Seq("o_orderkey" -> false, "o_orderstatus" -> false,
        "o_orderdate" -> false, "o_totalprice" -> true)
      .map { case (c, f) => one(c, f) }.mkString("\nUNION ALL\n")
  }

  /** Mirrors [[TextDedup.ngramJaccardPairs]]'s hashed-shingle join: the
    * identical 60-bit hash on both sides, so even a (astronomically
    * unlikely) collision counts the same way in both engines. The df cap
    * mirrors [[TextDedup.dfCapFor]] — `floor(x + 0.5)` is exactly JVM
    * `Math.round(double)`, so the two engines derive the identical cap
    * from the identical corpus count. */
  private def jaccardOracle: String =
    s"""WITH $shingleCte,
        cap AS (SELECT GREATEST(20, CAST(floor(count(*) * 4.0 / 1000.0 + 0.5) AS BIGINT)) AS df
                FROM documents),
        shh AS (SELECT doc_id, ('0x'||substr(md5(s),1,15))::BIGINT AS s FROM sh),
        sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
        rare AS (SELECT shh.doc_id, shh.s FROM shh
                 JOIN (SELECT s FROM shh GROUP BY s
                       HAVING count(*) BETWEEN 2 AND (SELECT df FROM cap)) d ON shh.s = d.s),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
                  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) AS jaccard
        FROM inter
        JOIN sizes na ON doc_a = na.doc_id
        JOIN sizes nb ON doc_b = nb.doc_id
        WHERE round(CAST(n_inter AS DOUBLE) / (na.n + nb.n - n_inter), 4) >= 0.5"""

  /** DuckDB twin of VectorFunctions: double-cast elementwise, left-fold sums. */
  private val normalizedCte =
    """n AS (SELECT vec_id,
              [CAST(x AS DOUBLE) / sqrt(list_sum([CAST(y AS DOUBLE)*CAST(y AS DOUBLE) for y in embedding]))
               for x in embedding] AS v
            FROM embeddings)"""

  /** CTE chain `n → sig → banded → pairs` reproducing
    * Similarity.cosineNearDupPairs' banded candidate graph (identical plane
    * derivation to Similarity.planeComponent). Shared with the q78 semantic
    * dedup oracle in [[Ext3Queries]]. */
  private[graft] def signLshPairsCtes: String = {
    val plane = "(('0x'||substr(md5('plane_'||j||'_'||d),1,15))::BIGINT / POW(2,59) - 1.0)"
    s"""$normalizedCte,
        sig AS (SELECT vec_id, v,
                 list_sum([CASE WHEN list_sum([v[d+1] * $plane for d in range(0,64)]) >= 0
                           THEN (1 << j) ELSE 0 END
                           for j in range(0,16)]) AS sig
                FROM n),
        banded AS (SELECT vec_id, v, 0 AS band, sig & 255 AS key FROM sig
                   UNION ALL
                   SELECT vec_id, v, 1 AS band, sig >> 8 AS key FROM sig),
        pairs AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_sum([p[1]*p[2] for p in list_zip(a.v, b.v)]), 6) AS cosine
                  FROM banded a JOIN banded b
                    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id)"""
  }

  private def signLshOracle: String =
    s"""WITH $signLshPairsCtes
        SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.3"""

  /** q25 oracle (round-18 — the portable-sketch evidence pattern applied
    * to the ANN family): a FULL replay of the persisted sign-LSH probe.
    * The 8×12 hyperplanes are md5-derived with the identical formula to
    * Similarity.planeVector (plane index t·12+j); bucket bits are the
    * SIGN of the plane dot — scale-invariant and order-robust (a real
    * dot is never within an ulp of zero, so any summation order agrees);
    * the probe ball is pure integer XOR logic with the Hamming depth
    * derived from the corpus count exactly as [[annLshProbeHFor]]; the
    * re-rank is the q24-proven cosine (dot of normalized vectors,
    * round 6, ties by vec_id). The hyperplanes are materialized ONCE as
    * 96 list rows (not re-hashed per vector element — 123M md5 calls at
    * sf1 otherwise). */
  private def annTopkOracle: String =
    s"""WITH $normalizedCte,
        corpus AS (SELECT vec_id, v FROM n WHERE vec_id <> 0),
        qv AS (SELECT v FROM n WHERE vec_id = 0),
        plv AS (SELECT t, j, list(p ORDER BY d) AS pv
                FROM (SELECT t, j, d,
                        ('0x'||substr(md5('plane_'||(t*12+j)||'_'||d),1,15))::BIGINT
                          / POW(2,59) - 1.0 AS p
                      FROM range(8) rt(t), range(12) rj(j), range(64) rd(d))
                GROUP BY t, j),
        sig AS (SELECT c.vec_id, p.t,
                  CAST(sum(CASE WHEN list_sum([z[1]*z[2]
                                 for z in list_zip(c.v, p.pv)]) >= 0
                           THEN (1 << p.j) ELSE 0 END) AS BIGINT) AS sig
                FROM corpus c, plv p GROUP BY 1, 2),
        qsig AS (SELECT p.t,
                  CAST(sum(CASE WHEN list_sum([z[1]*z[2]
                                 for z in list_zip(q.v, p.pv)]) >= 0
                           THEN (1 << p.j) ELSE 0 END) AS BIGINT) AS sig
                 FROM qv q, plv p GROUP BY 1),
        hh AS (SELECT CASE WHEN count(*) < 1000 THEN 3 ELSE 2 END AS h
               FROM corpus),
        masks AS (SELECT CAST(0 AS BIGINT) AS m
                  UNION ALL
                  SELECT CAST(1 << i AS BIGINT) FROM range(12) r(i)
                  UNION ALL
                  SELECT CAST((1 << i) | (1 << jj) AS BIGINT)
                  FROM range(12) ri(i), range(12) rjj(jj) WHERE jj > i
                  UNION ALL
                  SELECT CAST((1 << i) | (1 << jj) | (1 << l) AS BIGINT)
                  FROM range(12) ri(i), range(12) rjj(jj), range(12) rl(l)
                  WHERE jj > i AND l > jj AND (SELECT h FROM hh) >= 3),
        probes AS (SELECT q.t, xor(q.sig, m.m) AS bucket FROM qsig q, masks m),
        cand AS (SELECT DISTINCT s.vec_id
                 FROM sig s JOIN probes p ON s.t = p.t AND s.sig = p.bucket),
        scored AS (SELECT c.vec_id,
                     list_sum([z[1]*z[2] for z in list_zip(c.v, q.v)]) AS cos
                   FROM corpus c JOIN cand USING (vec_id), qv q)
        SELECT vec_id, round(cos, 6) AS cosine FROM scored
        ORDER BY cos DESC, vec_id LIMIT 10"""

  /** q36 oracle (round-18): full replay of the EXACT-trained IVF probe —
    * the q118 unrolled-CTE Lloyd over the md5-ordered sample, then probe
    * selection (top nProbe centroids by query dot, ties to the smaller
    * cid — Scala's stable sortBy), cell assignment (NearestCentroid
    * contract: ORDER BY dist, cid), and the exact cosine re-rank. */
  private def ivfTopkOracle(iters: Int, maxSample: Int, kOut: Int): String = {
    def dist(cqRef: String) =
      s"""list_sum([(p[1] - CAST(p[2] AS DOUBLE)/1000000.0) *
         |              (p[1] - CAST(p[2] AS DOUBLE)/1000000.0)
         |              for p in list_zip(e.v, $cqRef)])""".stripMargin
    // every CTE that is referenced more than once (and every round of the
    // training chain — c$r feeds BOTH a${r+1} and c${r+1}) MUST be
    // MATERIALIZED: this DuckDB inlines plain CTEs per reference, so the
    // five-round chain re-expands ~2^5 times. At 16 cells that read as a
    // tolerable 47 s at sf1; at the r19 adaptive 256 cells the inlined
    // plan thrashed past a 103 GB RSS and never finished (the same
    // lesson q89/q98/q110 already encode — see HANDOFF r18).
    val sb = new StringBuilder
    sb ++= s"""WITH $normalizedCte,
      |e AS MATERIALIZED (
      |  SELECT vec_id, v,
      |         [CAST(floor(x * 1000000.0) AS BIGINT) for x in v] AS q,
      |         ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT AS h
      |  FROM n WHERE vec_id <> 0),
      |cfg AS MATERIALIZED (
      |  SELECT least(256, greatest(16,
      |           CAST(floor(3.0 * sqrt(CAST(count(*) AS DOUBLE))) AS INT))) AS k
      |  FROM e),
      |cfg2 AS MATERIALIZED (SELECT greatest(4, CAST(floor(0.3 * k) AS INT)) AS np FROM cfg),
      |smp AS MATERIALIZED (
      |  SELECT vec_id, v, q FROM (
      |    SELECT vec_id, v, q,
      |           row_number() OVER (ORDER BY h, vec_id) AS rn FROM e)
      |  WHERE rn <= $maxSample),
      |c0 AS MATERIALIZED (
      |  SELECT rn - 1 AS cid, q AS cq FROM (
      |    SELECT q, row_number() OVER (ORDER BY h, vec_id) AS rn FROM e)
      |  WHERE rn <= (SELECT k FROM cfg)),
      |""".stripMargin
    for (r <- 1 to iters) {
      sb ++= s"""a$r AS MATERIALIZED (
        |  SELECT vec_id, q, cid AS c FROM (
        |    SELECT e.vec_id, e.q, c.cid,
        |           row_number() OVER (PARTITION BY e.vec_id
        |                              ORDER BY ${dist("c.cq")}, c.cid) AS rn
        |    FROM smp e, c${r - 1} c)
        |  WHERE rn = 1),
        |s$r AS MATERIALIZED (
        |  SELECT c AS cid, pos, sum(x) AS sx, count(*) AS n FROM (
        |    SELECT c, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS pos
        |    FROM a$r)
        |  GROUP BY c, pos),
        |n$r AS MATERIALIZED (
        |  SELECT cid,
        |         list(CAST((sx - (((sx % n) + n) % n)) / n AS BIGINT)
        |              ORDER BY pos) AS cq
        |  FROM s$r GROUP BY cid),
        |c$r AS MATERIALIZED (
        |  SELECT p.cid, COALESCE(nn.cq, p.cq) AS cq
        |  FROM c${r - 1} p LEFT JOIN n$r nn ON p.cid = nn.cid),
        |""".stripMargin
    }
    sb ++= s"""cd AS MATERIALIZED (SELECT cid, [CAST(x AS DOUBLE)/1000000.0 for x in cq] AS c
      |       FROM c$iters),
      |qn AS MATERIALIZED (SELECT v FROM n WHERE vec_id = 0),
      |prb AS MATERIALIZED (
      |  SELECT cid FROM (
      |    SELECT cd.cid,
      |           row_number() OVER (ORDER BY
      |             list_sum([z[1]*z[2] for z in list_zip(cd.c, q.v)]) DESC,
      |             cd.cid) AS rn
      |    FROM cd, qn q)
      |  WHERE rn <= (SELECT np FROM cfg2)),
      |asg AS MATERIALIZED (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, cd.cid,
      |           row_number() OVER (PARTITION BY e.vec_id
      |                              ORDER BY ${dist("cd.cq")}, cd.cid) AS rn
      |    FROM e, c$iters cd)
      |  WHERE rn = 1),
      |scored AS (
      |  SELECT e.vec_id,
      |         list_sum([z[1]*z[2] for z in list_zip(e.v, q.v)]) AS cos
      |  FROM e JOIN asg a ON e.vec_id = a.vec_id
      |  JOIN prb p ON a.cid = p.cid, qn q)
      |SELECT vec_id, round(cos, 6) AS cosine FROM scored
      |ORDER BY cos DESC, vec_id LIMIT $kOut""".stripMargin
    sb.toString
  }

  private[graft] def langidOracle: String = {
    def cnt(markers: Seq[String]): String = markers.map { m =>
      s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INTEGER)"
    }.mkString(" + ")
    val langs = TextAnalysis.langMarkers
    val cols = langs.map { case (l, ms) => s"${cnt(ms)} AS cnt_$l" }.mkString(", ")
    val names = langs.map(_._1)
    val cases = names.map { l =>
      val beats = names.filterNot(_ == l).map(o => s"cnt_$l >= cnt_$o").mkString(" AND ")
      s"WHEN cnt_$l > 0 AND $beats THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${names.map(l => s"cnt_$l").mkString(", ")},
               CASE $cases ELSE 'unknown' END AS predicted_lang
        FROM (SELECT doc_id, $cols
              FROM (SELECT doc_id, ' '||lower(text)||' ' AS p FROM documents))"""
  }

  private[graft] def qualityOracle: String =
    """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9_\s]', '', 'g')) AS BIGINT) AS n_punct,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
         CAST(CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' the ', ''))) / 5 AS INTEGER) AS BIGINT) AS n_stopwords,
         round(
           0.3 * least(CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 100.0, 1.0)
         + 0.3 * (1.0 - CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9_\s]', '', 'g')) AS DOUBLE) / length(text))
         + 0.4 * least(CAST(CAST((length(' '||lower(text)||' ') - length(replace(' '||lower(text)||' ', ' the ', ''))) / 5 AS INTEGER) AS DOUBLE)
                       / len(string_split_regex(trim(text), '\s+')) * 10.0, 1.0),
           4) AS quality_score
       FROM documents"""

  private def tokenBpeOracle: String =
    """SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
         CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_unique_ws_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
         round(CAST(length(text) AS DOUBLE) /
               greatest(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 1),
               4) AS chars_per_bpe_token
       FROM documents"""

  private def multimodalOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         ('0x'||substr(md5(text),1,4))::INTEGER % 1024 + 1 AS width,
         ('0x'||substr(md5(text),5,4))::INTEGER % 1024 + 1 AS height,
         round((('0x'||substr(md5(text),9,4))::INTEGER % 256) / 255.0, 4) AS brightness
       FROM documents"""

  /** q98 oracle (round-18): full replay of the exact-trained PQ probe.
    * Sub-quantizer training runs as ONE keyed CTE chain — rounds are
    * keyed by (subspace, cid) instead of 16 unrolled chains — with the
    * q118 exact-integer carry; encoding is the per-(vector, subspace)
    * argmin (NearestCentroid contract); the ADC score is rebuilt as an
    * EXPLICIT left-associated 16-term chain (a SQL SUM over the subspace
    * ips would be order-free and could drift an ulp at the shortlist
    * boundary — the fold order is part of the contract); shortlist and
    * re-rank mirror Pq.topK. All heavy CTEs MATERIALIZED (the q89
    * lesson: plain CTEs inline per reference and compound
    * exponentially). */
  private def pqTopkOracle(m: Int, nCodes: Int, iters: Int, kOut: Int,
                           maxSample: Int, subDim: Int): String = {
    def dist(svRef: String, cqRef: String) =
      s"""list_sum([(z[1] - CAST(z[2] AS DOUBLE)/1000000.0) *
         |            (z[1] - CAST(z[2] AS DOUBLE)/1000000.0)
         |            for z in list_zip($svRef, $cqRef)])""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH $normalizedCte,
      |e AS MATERIALIZED (
      |  SELECT vec_id, v,
      |         ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT AS h
      |  FROM n WHERE vec_id <> 0),
      |smp AS MATERIALIZED (
      |  SELECT vec_id, v, rn FROM (
      |    SELECT vec_id, v, row_number() OVER (ORDER BY h, vec_id) AS rn FROM e)
      |  WHERE rn <= $maxSample),
      |sp AS MATERIALIZED (
      |  SELECT s.rn, s.vec_id, g.sg,
      |         s.v[g.sg*$subDim+1 : g.sg*$subDim+$subDim] AS sv,
      |         [CAST(floor(x * 1000000.0) AS BIGINT)
      |          for x in s.v[g.sg*$subDim+1 : g.sg*$subDim+$subDim]] AS q
      |  FROM smp s, range($m) g(sg)),
      |c0 AS MATERIALIZED (
      |  SELECT sg, rn - 1 AS cid, q AS cq FROM sp WHERE rn <= $nCodes),
      |""".stripMargin
    for (r <- 1 to iters) {
      sb ++= s"""a$r AS MATERIALIZED (
        |  SELECT sg, vec_id, q, cid AS c FROM (
        |    SELECT p.sg, p.vec_id, p.q, c.cid,
        |           row_number() OVER (PARTITION BY p.sg, p.vec_id
        |                              ORDER BY ${dist("p.sv", "c.cq")}, c.cid) AS rn2
        |    FROM sp p JOIN c${r - 1} c ON c.sg = p.sg)
        |  WHERE rn2 = 1),
        |s$r AS MATERIALIZED (
        |  SELECT sg, c AS cid, pos, sum(x) AS sx, count(*) AS cnt FROM (
        |    SELECT sg, c, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS pos
        |    FROM a$r)
        |  GROUP BY 1, 2, 3),
        |n$r AS MATERIALIZED (
        |  SELECT sg, cid,
        |         list(CAST((sx - (((sx % cnt) + cnt) % cnt)) / cnt AS BIGINT)
        |              ORDER BY pos) AS cq
        |  FROM s$r GROUP BY 1, 2),
        |c$r AS MATERIALIZED (
        |  SELECT p.sg, p.cid, COALESCE(nn.cq, p.cq) AS cq
        |  FROM c${r - 1} p LEFT JOIN n$r nn ON p.sg = nn.sg AND p.cid = nn.cid),
        |""".stripMargin
    }
    val adcChain = (1 until m).foldLeft("t0.ip")((acc, i) => s"($acc + t$i.ip)")
    val adcJoins = (0 until m).map(i =>
      s"JOIN ci t$i ON t$i.vec_id = e.vec_id AND t$i.sg = $i").mkString("\n  ")
    sb ++= s"""ep AS MATERIALIZED (
      |  SELECT e.vec_id, g.sg,
      |         e.v[g.sg*$subDim+1 : g.sg*$subDim+$subDim] AS sv
      |  FROM e, range($m) g(sg)),
      |code AS MATERIALIZED (
      |  SELECT sg, vec_id, cid FROM (
      |    SELECT p.sg, p.vec_id, c.cid,
      |           row_number() OVER (PARTITION BY p.sg, p.vec_id
      |                              ORDER BY ${dist("p.sv", "c.cq")}, c.cid) AS rn2
      |    FROM ep p JOIN c$iters c ON c.sg = p.sg)
      |  WHERE rn2 = 1),
      |qn AS (SELECT v FROM n WHERE vec_id = 0),
      |lut AS MATERIALIZED (
      |  SELECT c.sg, c.cid,
      |         list_sum([z[1]*z[2] for z in list_zip(
      |           [CAST(x AS DOUBLE)/1000000.0 for x in c.cq],
      |           q.v[c.sg*$subDim+1 : c.sg*$subDim+$subDim])]) AS ip
      |  FROM c$iters c, qn q),
      |ci AS MATERIALIZED (
      |  SELECT code.vec_id, code.sg, lut.ip
      |  FROM code JOIN lut ON lut.sg = code.sg AND lut.cid = code.cid),
      |scored AS MATERIALIZED (
      |  SELECT e.vec_id, $adcChain AS adc
      |  FROM e
      |  $adcJoins),
      |sl AS (SELECT greatest(100, CAST(ceil(count(*) * 0.05) AS BIGINT)) AS sl
      |       FROM e),
      |short AS MATERIALIZED (
      |  SELECT vec_id FROM (
      |    SELECT vec_id, row_number() OVER (ORDER BY adc DESC, vec_id) AS rn
      |    FROM scored)
      |  WHERE rn <= (SELECT sl FROM sl))
      |SELECT vec_id, round(cos, 6) AS cosine FROM (
      |  SELECT e.vec_id,
      |         list_sum([z[1]*z[2] for z in list_zip(e.v, q.v)]) AS cos
      |  FROM e JOIN short USING (vec_id), qn q)
      |ORDER BY cos DESC, vec_id LIMIT $kOut""".stripMargin
    sb.toString
  }

  val oracles: Map[String, String] = Map(

    // q98: exact-PQ replay (round-18) — DuckDB re-trains all 16
    // sub-quantizers (5 integer-carry Lloyd rounds each), re-encodes,
    // re-derives the ADC shortlist and re-ranks.
    "q98_pq_topk" -> pqTopkOracle(m = PqM, nCodes = PqCodes,
      iters = graft.operators.Similarity.LloydIters, kOut = 10,
      maxSample = graft.operators.Similarity.DefaultTrainSample,
      subDim = EmbeddingDim / PqM),
    "q19_exact_dedup_groups" ->
      """SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fingerprint,
         min(doc_id) AS canonical_id, count(*) AS n_docs
         FROM documents GROUP BY 1""",
    "q20_minhash_lsh_pairs" -> minhashOracle,
    "q50_lsh_dedup_groups" -> lshGroupsOracle,
    "q21_simhash_pairs" -> simhashOracle,
    "q51_repetition_stats" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents),
          bg AS (SELECT doc_id,
                   unnest([('0x'||substr(md5(t[i] || ' ' || t[i+1]),1,15))::BIGINT
                           for i in range(1, len(t))]) AS bg
                 FROM toks),
          cnts AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2)
          SELECT doc_id,
            CAST(sum(cnt) AS BIGINT) AS n_bigrams,
            CAST(count(*) AS BIGINT) AS distinct_bigrams,
            round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4) AS top_bigram_share,
            round(1.0 - CAST(count(*) AS DOUBLE) / sum(cnt), 4) AS repetition
          FROM cnts GROUP BY doc_id""",
    "q52_column_profile" -> profileOracle,
    "q22_ngram_jaccard_pairs" -> jaccardOracle,
    "q23_embedding_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         scored AS (
           SELECT e.vec_id,
             list_sum([CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) for p in list_zip(e.embedding, q.qv)]) /
             (sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in e.embedding])) *
              sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in q.qv]))) AS cos
           FROM embeddings e, q WHERE e.vec_id <> 0)
         SELECT vec_id, round(cos, 6) AS cosine FROM scored
         ORDER BY cos DESC, vec_id LIMIT 10""",
    "q24_embedding_near_dup" -> signLshOracle,
    // q25: full sign-LSH probe replay (round-18) — signatures, probe ball,
    // and re-rank are all md5-derived / deterministic-IEEE; recall quality
    // is still separately gated in the query + SimilaritySpec.
    "q25_ann_topk" -> annTopkOracle,
    "q26_langid" -> langidOracle,
    "q44_containment_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents),
          shp AS (SELECT doc_id,
                   [array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 1))] AS sh
                  FROM toks),
          hashes AS (SELECT doc_id,
                   [('0x'||substr(md5(s),1,15))::BIGINT for s in sh] AS hs FROM shp),
          win AS (SELECT doc_id,
                   CASE WHEN len(hs) >= 4
                        THEN list_distinct([list_min(hs[i:i+3]) for i in range(1, len(hs)-2)])
                        WHEN len(hs) > 0 THEN [list_min(hs)]
                        ELSE [] END AS fps
                  FROM hashes),
          fp AS (SELECT doc_id, unnest(fps) AS fingerprint FROM win),
          rare AS (SELECT fp.doc_id, fp.fingerprint FROM fp
                   JOIN (SELECT fingerprint FROM fp GROUP BY fingerprint
                         HAVING count(*) BETWEEN 2 AND 50) d
                     ON fp.fingerprint = d.fingerprint)
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
          FROM rare a JOIN rare b
            ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING count(*) >= 3""",

    "q45_reject_breakdown" ->
      s"""SELECT error_details, count(*) AS n_rejects,
          round(avg(value), 4) AS avg_value
          FROM (SELECT ${Queries.sqlErrorDetails} AS error_details, value FROM events)
          WHERE error_details <> '' GROUP BY error_details""",

    "q35_streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
         count(*) AS n_events, round(sum(value),4) AS total_value
         FROM events GROUP BY 1, 2""",
    // append + watermark emits exactly the windows the final watermark
    // (max(ts) - 10 minutes) closed: q14/q35 restricted to window end <= wm
    "q72_streaming_append" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
         count(*) AS n_events, round(sum(value),4) AS total_value
         FROM events
         GROUP BY 1, 2
         HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
                <= (SELECT max(ts) - INTERVAL 10 MINUTE FROM events)""",
    "q37_winnow_fingerprints" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
                       FROM documents),
          shp AS (SELECT doc_id,
                   [array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 1))] AS sh
                  FROM toks),
          hashes AS (SELECT doc_id,
                   [('0x'||substr(md5(s),1,15))::BIGINT for s in sh] AS hs FROM shp),
          win AS (SELECT doc_id,
                   CASE WHEN len(hs) >= 4
                        THEN list_distinct([list_min(hs[i:i+3]) for i in range(1, len(hs)-2)])
                        WHEN len(hs) > 0 THEN [list_min(hs)]
                        ELSE [] END AS fps
                  FROM hashes)
          SELECT doc_id, unnest(fps) AS fingerprint FROM win""",
    // q36: exact-IVF replay (round-18) — integer micro-unit Lloyd over the
    // md5-ordered sample is order-independent, so DuckDB re-trains all 5
    // rounds from raw parquet and re-derives probe cells + re-rank.
    "q36_ivf_topk" -> ivfTopkOracle(
      iters = graft.operators.Similarity.LloydIters,
      maxSample = graft.operators.Similarity.DefaultTrainSample, kOut = 10),
    "q27_quality_score" -> qualityOracle,
    "q28_token_bpe" -> tokenBpeOracle,
    "q29_multimodal_features" -> multimodalOracle,
    // mirrors Multimodal.pngPayloadFromId's generation arithmetic: the
    // Spark side decodes these values out of real PNG pixels
    "q73_image_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(doc_id % 48 + 8 AS INT) AS width,
         CAST((doc_id // 48) % 48 + 8 AS INT) AS height,
         round((doc_id % 256 + (7*doc_id + 31) % 256 + (13*doc_id + 101) % 256)
               / (3.0 * 255.0), 4) AS brightness
         FROM documents""")
}
