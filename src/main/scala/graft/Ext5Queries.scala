package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SpanDedup

/** Round-11 declarations: span-level (exact-substring) deduplication — the
  * Lee et al. 2021 granularity the dedup family lacked. Document-level
  * operators (q18-q22, q37, q44, q47, q50, q78) decide KEEP or DROP per
  * document; these two find and surgically remove the duplicated *regions*,
  * which is how production training-data pipelines actually apply the
  * technique (a 90%-unique document should lose its boilerplate, not die).
  *
  *  - q100: per-document duplicated-span statistics (where and how much of
  *    the corpus is cross-document duplicated text).
  *  - q101: remove-all-but-one reconstruction (the canonical occurrence of
  *    every duplicated substring survives; every other occurrence is cut,
  *    token-exact, and the document is re-emitted).
  *
  * Both are fully SQL-expressible — the gaps-and-islands span merge is
  * window arithmetic — so both carry complete DuckDB oracles (hash-level
  * parity, not rows-only).
  *
  * Later round-11 declarations, same full-oracle bar: q102 incremental
  * corpus dedup (persisted MinHash-LSH index), q103 BM25 retrieval
  * scoring ([[graft.operators.TermWeighting.bm25TopDocs]]), q104
  * deterministic train/val/test split assignment
  * ([[graft.operators.Sampling.assignSplits]]), q105 interpolated bigram
  * LM scoring ([[graft.operators.TermWeighting.bigramLogLoss]]), q106
  * content-defined chunking ([[graft.operators.TextAnalysis.cdcChunks]]),
  * q107 mergeable HLL sketch rollup ([[graft.operators.SketchRollup]],
  * rows-only + self-gate), q108 quality-weighted rejection sampling
  * ([[graft.operators.Sampling.scoreSample]]), q109 sketch percentiles
  * (rows-only + rank-error self-gate), q110 BPE merge training
  * ([[graft.operators.BpeTrain]], rows-only + differential spec).
  */
object Ext5Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Gram width in tokens: spans shorter than K tokens are not reported.
    * Lee et al. use 50 BPE tokens at web scale; the synthetic corpus has
    * ~300-token documents, so K=8 keeps the same span-to-document ratio. */
  private val K = 8

  /** Frequent-gram prune: buckets larger than this are boilerplate, not
    * signal (see [[SpanDedup]] scaladoc). Far above any gram frequency the
    * synthetic corpus produces — present so the ORACLE pins the semantics,
    * not just the code path. */
  private val MaxGramDf = 1000

  // ------------------------------------------------------------------ queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q100_dup_spans" -> ((s, dir) =>
      SpanDedup.duplicateSpans(t(s, dir, "documents"), k = K, maxGramDf = MaxGramDf)),

    "q101_dedup_reconstruct" -> ((s, dir) =>
      SpanDedup.dedupReconstruct(t(s, dir, "documents"), k = K, maxGramDf = MaxGramDf)),

    // Incremental corpus dedup through a PERSISTED MinHash-LSH index — the
    // operational 100 TB shape: each incoming batch (doc_id % 10 == 0
    // stands in for "this crawl") is checked against the already-ingested
    // corpus (the other 90%) WITHOUT re-shingling it. The index (signatures
    // + band keys, ~4 orders of magnitude below the text) is built once per
    // (source, data fingerprint) — the IndexStore staleness protocol — so
    // the cold pass builds and every later pass is a pure probe, exactly
    // like the q25/q36 ANN indexes. Oracle recomputes both sides from
    // scratch; index persistence is invisible to results by construction.
    "q102_incremental_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = t(s, dir, "documents")
      val idxPath = graft.operators.Similarity.IndexStore.pathFor(
        s, s"$dir/documents.parquet", "text-lsh-k12b4-corpus-mod10")
      if (!graft.operators.Similarity.IndexStore.isBuilt(s, idxPath))
        graft.operators.TextDedup.buildLshIndex(
          docs.filter(col("doc_id") % 10 =!= 0), idxPath,
          k = ExtQueries.K, bands = ExtQueries.BANDS)
      graft.operators.TextDedup.probeLshIndex(
        docs.filter(col("doc_id") % 10 === 0), idxPath,
        k = ExtQueries.K, bands = ExtQueries.BANDS, minEstJaccard = 0.5)
    }),

    // Okapi BM25 retrieval scoring against a fixed query-term bag — the
    // targeted-corpus-pull / probe-query scorer. Query-term filter lands
    // before the one (doc,term) exchange; stats and df come back as
    // broadcasts; top-k via per-partition heaps, never a global window
    // over the scored set.
    "q103_bm25_rank" -> ((s, dir) =>
      graft.operators.TermWeighting.bm25TopDocs(
        t(s, dir, "documents"), Bm25Terms, topK = 20)),

    // Deterministic train/val/test assignment: a pure (seed, doc_id) hash
    // function of each row — stable under re-runs, repartitioning, and
    // engine swaps, so no document can leak from test into train when the
    // corpus is reprocessed. Shuffle-free scan projection.
    "q104_train_split" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.operators.Sampling.assignSplits(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        col("doc_id"), SplitBands)
    }),

    // Interpolated bigram LM scoring — word-ORDER perplexity filtering
    // (q85's unigram model can't see shuffled/concatenated text). The
    // model (exact-integer c2/cw tables) is built ONCE per corpus into a
    // fingerprinted path and scoring runs against the persisted copy
    // (r13 verdict #5: rebuilding the model per run was ~0.8s of the
    // 2.2s sf1 wall); cell-identical to the on-the-fly path — shared
    // scoring tail, same oracle, pinned by TermWeightingSpec.
    "q105_bigram_logloss" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val path = graft.operators.Similarity.IndexStore.pathFor(
        s, s"$dir/documents.parquet", "bigram_lm")
      graft.operators.TermWeighting.bigramModelLoadOrBuild(s, docs, path)
      graft.operators.TermWeighting.bigramLogLossIndexed(s, path, docs)
    }),

    // Content-defined chunking: hash-boundary chunks whose fingerprints
    // survive edits (FastCDC's property at token granularity) — the
    // chunk-level dedup primitive fixed windows (q65) cannot provide.
    // Shuffle-free array arithmetic; the ORACLE uses the equivalent
    // window/cumsum formulation.
    "q106_cdc_chunks" -> ((s, dir) =>
      graft.operators.TextAnalysis.cdcChunks(t(s, dir, "documents"))),

    // Mergeable distinct-count sketches: daily PORTABLE-HLL register rows
    // persisted to parquet (the lake-table seam), rolled up along the day
    // dimension by a plain register-lattice max-merge, then estimated —
    // a year-over-year distinct query reads sketch rows, not raw events.
    // Round-17: rows-only → HASH-GREEN — the portable registers
    // (md5-derived, exact-integer estimator sum; SketchRollup.PortableHll)
    // let DuckDB replay the merged ESTIMATE cell-exact (max is
    // associative, so merged daily registers equal direct registers over
    // all events, which is what the oracle computes). The ≤5%-vs-exact
    // runtime self-gate stays; the Datasketches binary-sketch variant
    // remains in SketchRollup for callers wanting fixed-size blobs.
    "q107_sketch_rollup" -> ((s, dir) => {
      import org.apache.spark.sql.functions.{col, count, countDistinct, date_trunc, lit, max, sum}
      import graft.operators.SketchRollup.PortableHll
      val ev = t(s, dir, "events")
      // ONE events pass for registers AND row counts (round-19.2): the
      // old shape scanned raw events twice (a registers pass and a counts
      // pass grouped by the same (event_type, day) keys). Each event
      // lands in exactly one hash bucket, so a per-bucket row count `bn`
      // in the register row recovers count(*) as sum(bn) — exact
      // integers, identical n_rows — and the lake seam becomes ONE table
      // whose rows carry (hm, bn), the same (sketch, n_rows) row design
      // as the Datasketches buildSketches variant. One scan + one write
      // replace two of each; both rollups below read the seam (register-
      // lattice-sized), never raw events.
      val daily = PortableHll.registersWithRowCount(ev,
        Seq("event_type" -> col("event_type"),
          "day" -> date_trunc("day", col("ts"))), col("user_id"))
      val lake = graft.util.Fs.scratchDir("graft-q107-sketches").toString
      daily.write.mode("overwrite").parquet(s"$lake/registers") // the seam
      val regs = s.read.parquet(s"$lake/registers")
      val merged = regs
        .groupBy(col("event_type"), col("hb")).agg(max("hm").as("hm"))
      val est = PortableHll.estimate(merged, Seq("event_type"))
      val n = regs.groupBy("event_type").agg(sum("bn").as("n_rows"))
      // persisted: the gate's collect below and the caller's final action
      // would otherwise each re-run the register read + estimate pipeline
      // (round-19; the frame is one row per event_type). The bench/verify
      // loops clearCache() per pass, same lifetime stance as marginMining.
      val out = est.join(n, "event_type")
        .select(col("event_type"), col("approx_distinct"), col("n_rows"))
        .persist()
      // two-level distinct (the q133 move): countDistinct alone plans an
      // Expand over the event stream; collapsing to distinct (type, user)
      // rows first map-side-combines. Identical exact integer.
      val exact = ev.select("event_type", "user_id").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("exact"))
      out.join(exact, "event_type").collect() // ≤ #event_types rows
        .foreach { r =>
          val (a, e) = (r.getAs[Double]("approx_distinct"), r.getAs[Long]("exact"))
          val relErr = math.abs(a - e) / e
          require(relErr <= 0.05,
            f"q107 ${r.getAs[String]("event_type")} merged-sketch error " +
              f"$relErr%.4f > 5%% (approx=$a exact=$e)")
        }
      out
    }),

    // Sketch-based percentiles — the 100 TB twin of q38: exact
    // percentile() buffers every group value; the KMV bottom-k sample
    // ([[graft.plans.BottomK]], seeded by the portable md5 hash of the
    // unique order key) is fixed-memory (k·16 bytes per group, map-side
    // combine) with a rank-error guarantee σ ≈ √(p(1−p)/k) ≈ 0.5% at
    // k = 10,000. Round-17: rows-only → HASH-GREEN — unlike
    // approx_percentile (Greenwald–Khanna, partition-order dependent),
    // the KMV sample is a pure function of the data, so DuckDB replays
    // sample selection AND the rank-indexed quantile reads cell-exact.
    // The rank self-gate stays: the oracle proves cross-engine agreement,
    // the gate proves the estimates still estimate.
    "q109_approx_percentiles" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      graft.plans.Hash60.register(s)
      graft.plans.BottomK.register(s)
      val o = t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
      def at(p: Double) = element_at(col("sample"),
        ceil(lit(p) * size(col("sample"))).cast("int"))
      val approx = o.groupBy(col("o_orderstatus"))
        .agg(graft.plans.BottomK.of(
          call_function("graft_hash60", col("o_orderkey").cast("string")),
          col("o_totalprice").cast("double"), 10000).as("sample"))
        .select(col("o_orderstatus"), at(0.5).as("p50"), at(0.9).as("p90"))
      def rank(v: String) =
        (sum(when(col("o_totalprice") <= col(v), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as(s"r_$v")
      o.join(broadcast(approx), "o_orderstatus")
        .groupBy(col("o_orderstatus")).agg(rank("p50"), rank("p90"))
        .collect() // ≤ #statuses rows
        .foreach { r =>
          def gate(c: String, target: Double): Unit = {
            val err = math.abs(r.getAs[Double](s"r_$c") - target)
            require(err <= 0.01, f"q109 ${r.getString(0)} $c rank error " +
              f"$err%.4f > 1%% (sketch regression)")
          }
          gate("p50", 0.5); gate("p90", 0.9)
        }
      approx.select(col("o_orderstatus"),
        round(col("p50"), 4).as("p50_approx"), round(col("p90"), 4).as("p90_approx"))
    }),

    // BPE merge-rule training: learn a tokenizer FROM the corpus (the
    // step beyond q28's fixed tokenizer). One corpus pass builds the
    // vocab-sized word dict; the 12-round merge loop runs on the dict.
    // Round-19: HASH-GREEN — the full 12-round loop replays in DuckDB
    // via bpeTrainCtes(12) (q111's proven two-round chain, unrolled);
    // the differential spec vs the in-memory reference trainer stays.
    "q110_bpe_train" -> ((s, dir) =>
      graft.operators.BpeTrain.learnMerges(t(s, dir, "documents"), numMerges = 12)),

    // First two BPE merge rounds, ORACLE-BACKED (r11 verdict ask #7): for
    // a FIXED round count the trainer's recurrence is plain SQL — base
    // char dict, round-1 pair argmax, greedy merge application (the a==b
    // overlap case falls out of a gaps-and-islands parity over match
    // positions), round-2 argmax. Runs the PRODUCTION trainer, so the
    // second engine now checks the same code path q110's 12-round loop
    // exercises; the full loop stays differential (no tractable SQL for
    // an unbounded argmax recursion).
    "q111_bpe_first_merges" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      graft.operators.BpeTrain.learnMerges(t(s, dir, "documents"), numMerges = 2)
        .select(col("merge_rank"), col("left").as("left_sym"),
          col("right").as("right_sym"), col("pair_count"))
    }),

    // REAL video decode end-to-end (round 12, the last stubbed modality):
    // deterministic Motion-JPEG AVI clips generated per doc_id — true
    // RIFF container, true JPEG frames — parsed back by the pure-JDK
    // MjpegAviParser via the dead-letter seam. Frame count and geometry
    // are closed-form in doc_id, so the oracle is plain arithmetic over
    // documents while real AVI bytes flow through the executors — the
    // video twin of q73/q97. Brightness is spec-gated (JPEG is lossy),
    // not oracle-projected, same split as q73's PNG-vs-JPEG.
    "q112_video_decode" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val media = graft.operators.Multimodal
        .aviPayloadFromId(t(s, dir, "documents"))
      val (valid, _, _) = graft.operators.Multimodal.videoFramesOrReject(media)
      valid.select(col("media_id"), col("frame_idx"), col("n_frames"),
        col("width"), col("height"))
    }),

    // Gopher §A1 rule gate (round 13): the hard-threshold, per-rule-
    // auditable sibling of q27's soft composite — which rule dropped the
    // document is a first-class output column. Full oracle: every signal
    // is exact integer arithmetic + one double division, booleans match
    // hash-exact across engines.
    "q113_gopher_gate" -> ((s, dir) =>
      graft.operators.TextAnalysis.gopherRules(t(s, dir, "documents"))),

    // N-gram novelty (round 13): fraction of each doc's distinct trigrams
    // first seen IN that doc — the temporal-diversity signal (dedup asks
    // "is this a copy?", novelty asks "how much is new?"). Full oracle on
    // the shared shingle CTE.
    "q114_ngram_novelty" -> ((s, dir) =>
      graft.operators.TextAnalysis.noveltyScores(t(s, dir, "documents"))),

    // Quality-weighted rejection sampling: acceptance probability == the
    // doc's own q27 quality score — soft filtering (FineWeb-style), no
    // threshold cliff, deterministic in (seed, doc_id).
    "q108_quality_sample" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val scored = graft.operators.TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("quality_score"))
      graft.operators.Sampling.scoreSample(scored, col("quality_score"), col("doc_id"))
    })
  )

  /** q103's query bag: mid-df corpus terms; shared with the oracle. */
  private[graft] val Bm25Terms = Seq("hash", "merge", "vector")

  /** q104's bands: 80/10/10, cut points accumulated left-to-right (the
    * oracle mirrors the same additions — see [[Sampling.assignSplits]]). */
  private[graft] val SplitBands = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  // ------------------------------------------------------------------ oracles

  /** Shared oracle prelude: tokenize + position-indexed k-gram hashes,
    * mirroring [[SpanDedup.gramStructs]] bit-for-bit (same md5 prefix, same
    * 1-based positions, same space join). */
  private val gramCtes =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
       |  FROM documents
       |),
       |grams AS (
       |  SELECT doc_id, i AS pos,
       |         substr(md5(array_to_string(t[i:i+${K - 1}], ' ')), 1, 16) AS g
       |  FROM toks, UNNEST(generate_series(1, len(t) - ${K - 1})) AS u(i)
       |  WHERE len(t) >= $K
       |)""".stripMargin

  /** Gaps-and-islands span merge over a `hits(doc_id, pos)` CTE — hits
    * [p, p+K) and [q, q+K) coalesce iff q - p <= K. */
  private val spanCtes =
    s"""lagged AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos - coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), pos) > $K
       |              THEN 1 ELSE 0 END AS gap
       |  FROM hits
       |),
       |isl AS (
       |  SELECT doc_id, pos,
       |         SUM(gap) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM lagged
       |),
       |spans AS (
       |  SELECT doc_id, min(pos) AS lo, max(pos) + ${K - 1} AS hi
       |  FROM isl GROUP BY doc_id, island
       |)""".stripMargin

  /** The BPE trainer's recurrence unrolled `rounds` rounds as a CTE
    * chain — the q118/pagerank unrolled-replay pattern applied to the
    * merge-learning loop. Round r over dict d{r-1}(w, cnt, syms):
    * weighted adjacent-pair counts (p$r), argmax with the trainer's
    * byte-order tiebreak (m$r: pc DESC, a, b — DuckDB binary collation ==
    * Spark UTF8String compare), then GREEDY LEFT-TO-RIGHT application:
    * match positions (mt$r), gaps-and-islands parity over runs of
    * consecutive matches (rn$r/sv$r — when a==b only every other match
    * of a run survives, exactly the fold's acc.last pairing; when a<>b
    * runs are singletons and every match survives), rebuild (d$r).
    *
    * Round-19: generalized from the fixed two-round chain — 12 rounds
    * replays q110's ENTIRE training loop and d12 IS the 12-rule encoded
    * vocabulary, so q110 and q121 graduate from rows-only to hash-green.
    * Every CTE is MATERIALIZED (the r18 q89 lesson: plain CTEs inline
    * per reference and a 12-round chain re-expands combinatorially).
    * Boundary: learnMerges stops early if the vocab exhausts (no
    * adjacent pair left) — no corpus this engine tests comes close, and
    * an exhausted round would diverge loudly (empty m$r empties d$r).
    * Must follow a WITH. */
  private[graft] def bpeTrainCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""btoks AS MATERIALIZED (
         |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
         |  FROM documents
         |),
         |d0 AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS cnt, string_split(w, '') AS syms
         |  FROM btoks WHERE w <> '' GROUP BY w
         |)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
         |p$r AS MATERIALIZED (
         |  SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(cnt) AS BIGINT) AS pc
         |  FROM d${r - 1}, unnest(range(1, len(syms))) AS t(i)
         |  GROUP BY 1, 2
         |),
         |m$r AS MATERIALIZED (SELECT a, b, pc FROM p$r ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
         |mt$r AS MATERIALIZED (
         |  SELECT d.w, i AS pos
         |  FROM d${r - 1} d CROSS JOIN m$r m, unnest(range(1, len(d.syms))) AS t(i)
         |  WHERE d.syms[i] = m.a AND d.syms[i+1] = m.b
         |),
         |rn$r AS MATERIALIZED (
         |  SELECT w, pos,
         |         pos - CAST(row_number() OVER (PARTITION BY w ORDER BY pos) AS BIGINT) AS grp
         |  FROM mt$r
         |),
         |sv$r AS MATERIALIZED (
         |  SELECT w, list(pos ORDER BY pos) AS sv
         |  FROM (SELECT w, pos, grp,
         |               CAST(row_number() OVER (PARTITION BY w, grp ORDER BY pos) AS BIGINT) AS k
         |        FROM rn$r)
         |  WHERE (k % 2) = 1
         |  GROUP BY w
         |),
         |d$r AS MATERIALIZED (
         |  SELECT d.w, d.cnt,
         |    list_filter(
         |      list_transform(range(1, len(d.syms)+1), i ->
         |        CASE
         |          WHEN s.sv IS NOT NULL AND list_contains(s.sv, i) THEN m.a || m.b
         |          WHEN s.sv IS NOT NULL AND list_contains(s.sv, i-1) THEN NULL
         |          ELSE d.syms[i]
         |        END),
         |      x -> x IS NOT NULL) AS syms
         |  FROM d${r - 1} d LEFT JOIN sv$r s USING (w) CROSS JOIN m$r m
         |)""".stripMargin
    }
    sb.toString
  }

  /** ENCODE-stats tail over an encoded dict CTE `d$rounds(w, cnt, syms)`:
    * per-doc term frequencies joined to the vocab's encoded lengths —
    * the exact aggregation [[graft.operators.BpeCodec.statsFromEncodedVocab]]
    * computes. Shared by the q121 (12-rule) and q122 (2-rule) oracles. */
  private[graft] def bpeEncodeStatsSql(rounds: Int): String =
    s"""WITH ${bpeTrainCtes(rounds)},
       |wtf AS MATERIALIZED (
       |  SELECT doc_id, w, count(*) AS tf
       |  FROM (SELECT doc_id,
       |               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY doc_id, w),
       |enc AS MATERIALIZED (
       |  SELECT w, CAST(len(syms) AS BIGINT) AS n_syms FROM d$rounds)
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
       |       CAST(sum(tf * length(w)) AS BIGINT) AS n_chars,
       |       CAST(sum(tf * n_syms) AS BIGINT) AS n_bpe_tokens,
       |       round(CAST(sum(tf * length(w)) AS DOUBLE) / sum(tf * n_syms), 4)
       |         AS chars_per_token
       |FROM wtf JOIN enc USING (w)
       |GROUP BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(

    // q107: the portable-HLL rollup replayed from raw events — max-merge
    // of daily registers is associative, so the oracle computes the same
    // registers directly per event_type and applies the identical
    // exact-integer estimator chain (see Queries.hllScalarSql for the
    // scalar form of the same derivation).
    "q107_sketch_rollup" ->
      """WITH ro AS (
        |  SELECT event_type, h >> 48 AS hb, h & 281474976710655 AS rest
        |  FROM (SELECT event_type,
        |          (('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT) AS h
        |        FROM events)),
        |go AS (SELECT event_type, hb,
        |         max(CASE WHEN rest = 0 THEN 49
        |             ELSE 49 - length(bin(rest)) END) AS hm
        |       FROM ro GROUP BY event_type, hb),
        |so AS (SELECT event_type,
        |         CAST(sum(1::BIGINT << (49 - hm)) AS BIGINT) AS s,
        |         count(*) AS nb
        |       FROM go GROUP BY event_type),
        |eo AS (SELECT event_type, (4096 - nb) AS v,
        |              s + (4096 - nb) * 562949953421312 AS n FROM so),
        |fo AS (SELECT event_type,
        |         round(CASE WHEN v > 0 AND
        |             (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 562949953421312.0 / CAST(n AS DOUBLE) <= 2.5 * 4096.0
        |           THEN 4096.0 * ln(4096.0 / CAST(v AS DOUBLE))
        |           ELSE (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 562949953421312.0 / CAST(n AS DOUBLE) END, 4)
        |           AS approx_distinct
        |       FROM eo)
        |SELECT f.event_type, f.approx_distinct, n.n_rows
        |FROM fo f JOIN (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
        |                FROM events GROUP BY event_type) n USING (event_type)""".stripMargin,

    // q109: the KMV quantile sketch replayed — sample = k smallest
    // (md5-hash, value) pairs per group (collision-proof pair ordering),
    // quantile = value at rank ceil(p·n) of the value-sorted sample.
    "q109_approx_percentiles" ->
      """WITH h AS (
        |  SELECT o_orderstatus, o_totalprice,
        |         (('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)),1,15))::BIGINT) AS hh
        |  FROM orders),
        |s AS (
        |  SELECT o_orderstatus, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY hh, o_totalprice) AS rn
        |  FROM h),
        |r AS (
        |  SELECT o_orderstatus, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |                            ORDER BY o_totalprice) AS vr,
        |         count(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM s WHERE rn <= 10000)
        |SELECT o_orderstatus,
        |  round(max(CASE WHEN vr = CAST(ceil(0.5 * n) AS BIGINT)
        |            THEN o_totalprice END), 4) AS p50_approx,
        |  round(max(CASE WHEN vr = CAST(ceil(0.9 * n) AS BIGINT)
        |            THEN o_totalprice END), 4) AS p90_approx
        |FROM r GROUP BY o_orderstatus""".stripMargin,

    // q112: every decoded feature in the projection is id-arithmetic —
    // the DECODE is what the match proves (a parser that mis-walks the
    // RIFF chunks or drops a frame changes frame_idx/n_frames/geometry).
    "q112_video_decode" ->
      s"""SELECT CAST(doc_id AS BIGINT) AS media_id,
         |       CAST(f AS INTEGER) AS frame_idx,
         |       CAST(doc_id % 3 + 2 AS INTEGER) AS n_frames,
         |       CAST(doc_id % 48 + 8 AS INTEGER) AS width,
         |       CAST((doc_id // 48) % 48 + 8 AS INTEGER) AS height
         |FROM documents, unnest(range(0, doc_id % 3 + 2)) AS t(f)
         |ORDER BY media_id, frame_idx""".stripMargin,

    // q111: the BPE recurrence unrolled two rounds in SQL (the
    // bpeTrainCtes builder at rounds=2 — see its scaladoc for the greedy
    // application semantics and the byte-order tiebreak).
    "q111_bpe_first_merges" ->
      s"""WITH ${bpeTrainCtes(2)}
         |SELECT 1 AS merge_rank, a AS left_sym, b AS right_sym, pc AS pair_count FROM m1
         |UNION ALL
         |SELECT 2, a, b, pc FROM m2
         |ORDER BY merge_rank""".stripMargin,

    // q110 (round-19, rows-only -> HASH-GREEN): the ENTIRE 12-round
    // training loop replayed — the same chain q111 proves for two rounds,
    // unrolled twelve. DuckDB re-learns every rule from raw parquet; a
    // drift in any round's argmax, tiebreak, or greedy application
    // breaks the hash.
    "q110_bpe_train" ->
      s"""WITH ${bpeTrainCtes(12)}
         |${(1 to 12).map(r =>
             s"""SELECT $r AS merge_rank, a AS "left", b AS "right", pc AS pair_count FROM m$r""")
           .mkString("\nUNION ALL\n")}
         |ORDER BY merge_rank""".stripMargin,

    // q122: the same learning chain; after the round-2 apply, d2's syms
    // ARE the 2-rule encodes of every vocab word (round-19: the encode
    // tail now reads len(d2.syms) via the shared bpeEncodeStatsSql —
    // the previous separator-replace() formulation under-merged
    // IMMEDIATELY ADJACENT (a,b)(a,b) occurrences because SQL replace
    // consumes the shared separator and does not re-scan it; the corpus
    // never exhibited the pattern under the learned m1/m2, but the
    // builder path is overlap-correct by construction).
    "q122_bpe_encode_2rules" -> bpeEncodeStatsSql(2),

    "q100_dup_spans" ->
      s"""WITH $gramCtes,
         |hits AS (
         |  SELECT doc_id, pos FROM grams
         |  WHERE g IN (SELECT g FROM grams GROUP BY g
         |              HAVING min(doc_id) <> max(doc_id) AND count(*) <= $MaxGramDf)
         |),
         |$spanCtes
         |SELECT doc_id,
         |       CAST(count(*) AS BIGINT) AS n_dup_spans,
         |       CAST(sum(hi - lo + 1) AS BIGINT) AS dup_tokens
         |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q101_dedup_reconstruct" ->
      s"""WITH $gramCtes,
         |ranked AS (
         |  SELECT doc_id, pos,
         |         row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         |         count(*) OVER (PARTITION BY g) AS cnt,
         |         min(doc_id) OVER (PARTITION BY g) AS mn,
         |         max(doc_id) OVER (PARTITION BY g) AS mx
         |  FROM grams
         |),
         |hits AS (
         |  SELECT doc_id, pos FROM ranked
         |  WHERE mn <> mx AND cnt <= $MaxGramDf AND rn > 1
         |),
         |$spanCtes,
         |sel AS (
         |  SELECT doc_id, i, t[i] AS tok
         |  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
         |),
         |kept AS (
         |  SELECT s.doc_id, s.i, s.tok FROM sel s
         |  WHERE NOT EXISTS (SELECT 1 FROM spans sp
         |                    WHERE sp.doc_id = s.doc_id AND s.i BETWEEN sp.lo AND sp.hi)
         |),
         |agg AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text
         |  FROM kept GROUP BY doc_id
         |),
         |rem AS (
         |  SELECT doc_id, sum(hi - lo + 1) AS n_removed FROM spans GROUP BY doc_id
         |)
         |SELECT toks.doc_id,
         |       coalesce(agg.clean_text, '') AS clean_text,
         |       CAST(coalesce(rem.n_removed, 0) AS BIGINT) AS n_removed_tokens
         |FROM toks
         |LEFT JOIN agg USING (doc_id)
         |LEFT JOIN rem USING (doc_id)
         |ORDER BY toks.doc_id""".stripMargin,

    // Same signature/banding fragments as q20/q50's oracles; the
    // corpus/incoming split is the doc_id % 10 rule the query uses, and
    // the estimate is the agreeing-minhash fraction both sides compute in
    // exact BIGINT arithmetic (every product < 2^57).
    "q102_incremental_dedup" -> {
      val agree = (0 until ExtQueries.K)
        .map(j => s"(CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH ${ExtQueries.shingleCte}, ${ExtQueries.minhashSigSql},
         |bands AS (${ExtQueries.bandSql}),
         |cand AS (SELECT DISTINCT p.doc_id AS a, x.doc_id AS b
         |         FROM bands p JOIN bands x
         |           ON p.band_id = x.band_id AND p.band_key = x.band_key
         |         WHERE p.doc_id % 10 = 0 AND x.doc_id % 10 <> 0),
         |est AS (SELECT a, b, ($agree) / ${ExtQueries.K}.0 AS e
         |        FROM cand JOIN sig sa ON a = sa.doc_id JOIN sig sb ON b = sb.doc_id)
         |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS dup_of,
         |       round(max(e), 4) AS best_est_jaccard
         |FROM est WHERE e >= 0.5 GROUP BY a ORDER BY a""".stripMargin
    },

    // Every float subexpression is spelled with the same literals and the
    // same operation order as the Scala side (idf, length norm, the
    // (1.2 + 1.0) numerator constant), each per-term weight is quantized
    // to 6 decimals BEFORE the per-doc sum so Spark's arbitrary addition
    // order cannot move the 4th decimal of the total.
    "q103_bm25_rank" -> {
      val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                         x -> x <> '')) AS dl,
         |         unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
         |                            x -> x <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tok
         |       WHERE term IN ($terms) GROUP BY doc_id, dl, term),
         |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |stats AS (SELECT count(*) AS n,
         |                 CAST(sum(dl2) AS DOUBLE) / count(*) AS avgdl
         |          FROM (SELECT len(list_filter(
         |                  string_split_regex(lower(trim(text)), '\\s+'),
         |                  x -> x <> '')) AS dl2 FROM documents)),
         |scored AS (
         |  SELECT doc_id,
         |         round(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
         |               * (tf * (1.2 + 1.0))
         |               / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)), 6) AS w
         |  FROM tf JOIN dfc USING (term), stats),
         |agg AS (SELECT doc_id, count(*) AS n_hit_terms,
         |               round(sum(w), 4) AS bm25
         |        FROM scored GROUP BY doc_id)
         |SELECT doc_id, n_hit_terms, bm25, rk FROM (
         |  SELECT doc_id, n_hit_terms, bm25,
         |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rk
         |  FROM agg)
         |WHERE rk <= 20""".stripMargin
    },

    // The band cut points are the SAME left-to-right additions the Scala
    // side folds (0.8, then 0.8 + 0.1) — never a fresh 0.9 literal, which
    // need not be the bit pattern the accumulation produces.
    "q104_train_split" ->
      """SELECT doc_id, lang, source,
        |       CASE WHEN u < 0.8 THEN 'train'
        |            WHEN u < 0.8 + 0.1 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang, source,
        |             (('0x'||substr(md5('graft|'||doc_id), 1, 8))::BIGINT
        |              % 1000000) / 1000000.0 AS u
        |      FROM documents)""".stripMargin,

    // λ and 1−λ spelled as the same literals/operations as the Scala side
    // (0.7, (1.0 - 0.7)); the Σ tf·(−ln p) / Σ tf shape mirrors q85's
    // oracle, which established the pattern's cross-engine stability.
    "q105_bigram_logloss" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |tf2 AS (SELECT doc_id, w1, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM tf2 GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
        |cw AS (SELECT w, count(*) AS cw
        |       FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |n AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM cw)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |       round(sum(tf * -ln(0.7 * (CAST(c2 AS DOUBLE) / c1)
        |                          + (1.0 - 0.7) * (CAST(cw AS DOUBLE) / n)))
        |             / sum(tf), 4) AS avg_nll
        |FROM tf2 JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |     JOIN cw ON w2 = w, n
        |GROUP BY doc_id""".stripMargin,

    // The cumsum(boundary) − boundary window assignment is provably the
    // same partition as the Scala side's array-land cut arithmetic: a
    // token's chunk_id is the number of boundary tokens strictly before
    // it, and a boundary token CLOSES its own chunk. Same md5-prefix hash
    // family as q57/q104.
    "q106_cdc_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, i, t[i] AS tok
        |  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)),
        |marked AS (
        |  SELECT doc_id, i, tok,
        |         CASE WHEN ('0x'||substr(md5(tok), 1, 8))::BIGINT % 16 = 0
        |              THEN 1 ELSE 0 END AS b
        |  FROM pos),
        |cum AS (
        |  SELECT doc_id, i, tok,
        |         sum(b) OVER (PARTITION BY doc_id ORDER BY i) - b AS chunk_id
        |  FROM marked)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       CAST(min(i) AS BIGINT) AS begin_pos,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       substr(md5(string_agg(tok, ' ' ORDER BY i)), 1, 16) AS chunk_hash
        |FROM cum GROUP BY doc_id, chunk_id""".stripMargin,

    // q113: rule comparisons on UNROUNDED values (each is an exact
    // integer ratio, so the single double division is the identical IEEE
    // op in both engines); displayed ratios rounded to 4. The stop list,
    // thresholds and the trim/lower/split pipeline mirror
    // TextAnalysis.gopherRules verbatim.
    "q113_gopher_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, lower(trim(text)) AS txt,
        |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(t) AS BIGINT) AS n_words,
        |         CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0)
        |              AS BIGINT) AS sum_len,
        |         CAST(len(list_filter(t, x -> list_contains(
        |           ['the','be','to','of','and','that','have','with'], x)))
        |              AS BIGINT) AS n_stop,
        |         CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
        |              AS BIGINT) AS n_alpha,
        |         CAST(length(txt) - length(replace(txt, '#', ''))
        |              AS BIGINT) AS n_hash,
        |         CAST((length(txt) - length(replace(txt, '...', ''))) / 3
        |              AS BIGINT) AS n_ell
        |  FROM toks)
        |SELECT doc_id, n_words,
        |       CASE WHEN n_words > 0
        |            THEN round(CAST(sum_len AS DOUBLE) / n_words, 4) END
        |         AS mean_word_len,
        |       n_stop AS n_stopwords,
        |       CASE WHEN n_words > 0
        |            THEN round(CAST(n_alpha AS DOUBLE) / n_words, 4) END
        |         AS frac_alpha_words,
        |       CASE WHEN n_words > 0
        |            THEN round(CAST(n_hash + n_ell AS DOUBLE) / n_words, 4) END
        |         AS symbol_ratio,
        |       (n_words >= 50 AND n_words <= 100000) AS r_word_count,
        |       (n_words > 0 AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
        |                    AND CAST(sum_len AS DOUBLE) / n_words <= 10.0)
        |         AS r_mean_word_len,
        |       (n_words > 0 AND CAST(n_hash + n_ell AS DOUBLE) / n_words <= 0.1)
        |         AS r_symbol_ratio,
        |       (n_words > 0 AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8)
        |         AS r_alpha_words,
        |       (n_stop >= 2) AS r_stopwords,
        |       (n_words >= 50 AND n_words <= 100000 AND n_words > 0
        |        AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
        |        AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
        |        AND CAST(n_hash + n_ell AS DOUBLE) / n_words <= 0.1
        |        AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
        |        AND n_stop >= 2) AS keep
        |FROM m""".stripMargin,

    // q114: the same distinct-trigram CTE as the minhash family
    // (ExtQueries.shingleCte), first-occurrence = min(doc_id) per gram.
    // All-integer until the final division; round 4 both sides.
    "q114_ngram_novelty" ->
      s"""WITH ${ExtQueries.shingleCte},
         |firsts AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
         |SELECT doc_id,
         |       CAST(count(*) AS BIGINT) AS n_grams,
         |       CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_novel,
         |       round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*), 4) AS novelty
         |FROM sh JOIN firsts USING (s)
         |GROUP BY doc_id""".stripMargin,

    // Score formula shared verbatim with q27's oracle; the acceptance
    // comparison uses the q57/q104 md5 hash unit. Both operands are the
    // identical rounded values in both engines, so the kept set is exact.
    "q108_quality_sample" ->
      s"""WITH q AS (${ExtQueries.qualityOracle})
         |SELECT doc_id, quality_score FROM q
         |WHERE (('0x'||substr(md5('graft|'||doc_id), 1, 8))::BIGINT
         |       % 1000000) / 1000000.0 < quality_score""".stripMargin
  )
}
