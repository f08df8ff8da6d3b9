package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document-level text analysis: language id, quality scoring, token
  * statistics. Pure column expressions (one projection over the scan, no
  * shuffle, whole-stage codegen), each with an exact SQL twin for the
  * oracle. */
object TextAnalysis {

  /** Marker tokens per language for the n-gram/stopword heuristic. Priority
    * order (en, de, es, fr) breaks ties deterministically. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and "),
    "de" -> Seq(" der ", " und "),
    "es" -> Seq(" el ", " que "),
    "fr" -> Seq(" le ", " et "))

  private def padded(textCol: Column): Column =
    concat(lit(" "), lower(textCol), lit(" "))

  /** Conditional scan rebalance (the round-15 single-partition lesson):
    * every operator here is per-row work with no downstream exchange to
    * spread it, so a small single-file corpus would run entirely on one
    * core. A many-split 100 TB input takes the free path. */
  private def balancedDocs(docs: DataFrame): DataFrame = {
    // every caller tokenizes right after — register the kernel here once
    graft.plans.Tokenize.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
  }

  /** (doc_id, cnt_en, cnt_de, cnt_es, cnt_fr, predicted_lang). Marker-count
    * argmax with a fixed priority chain; 'unknown' when no marker hits. */
  def langId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val p = padded(col(textCol))
    val counts = langMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => occurrences(p, m)).reduce(_ + _)
    }
    val withCounts = counts.foldLeft(balancedDocs(docs).select(col(idCol), col(textCol))) {
      case (d, (lang, c)) => d.withColumn(s"cnt_$lang", c)
    }
    // argmax with priority order: first language whose count is >= all others
    // and > 0.
    val langs = langMarkers.map(_._1)
    val predicted = langs.foldRight(lit("unknown")) { (lang, els) =>
      val c = col(s"cnt_$lang")
      val beatsRest = langs.filterNot(_ == lang)
        .map(o => c >= col(s"cnt_$o")).reduce(_ && _)
      when(c > 0 && beatsRest, lit(lang)).otherwise(els)
    }
    withCounts.select(
      (col(idCol) +: langs.map(l => col(s"cnt_$l"))) :+ predicted.as("predicted_lang"): _*)
  }

  /** Quality features + a bounded composite score:
    * length signal, punctuation penalty, stopword signal. All arithmetic is
    * reproducible in the oracle (round at the end only). */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // counts come from ONE fused byte scan ([[graft.plans.CharClassCounts]]
    // — replaces 2 regexp_replace traversals + the lower/pad/replace
    // stopword chain; q27 was 13× DuckDB at sf1 on exactly this work).
    // The score formula and the oracle are untouched: the kernel's counts
    // are defined as the regex forms' semantics, spec-pinned in
    // QualityKernelSpec.
    graft.plans.CharClassCounts.register(docs.sparkSession)
    val text = col(textCol)
    // n_tokens comes from the SAME fused scan (kernel field n_ws_tokens,
    // defined as exactly size(split(trim(text), "\s+", -1)) — round-20):
    // the split form allocated the full token array per row only to take
    // its size, and was the other half of q90/q27's scan-stage wall.
    val pre = balancedDocs(docs).select(
      col(idCol),
      length(text).cast("long").as("n_chars"),
      call_function("graft_quality_counts", text).as("__cc"))
      .withColumn("n_tokens", col("__cc.n_ws_tokens"))
    val punct = col("__cc.n_punct")
    val stop = col("__cc.n_stop")
    val punctRatio = punct.cast("double") / col("n_chars")
    val stopRatio = stop.cast("double") / col("n_tokens")
    pre.select(
      col(idCol),
      col("n_chars"),
      col("n_tokens"),
      punct.as("n_punct"),
      col("__cc.n_digits").as("n_digits"),
      stop.as("n_stopwords"),
      round(
        lit(0.3) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - punctRatio) +
          lit(0.4) * least(stopRatio * 10.0, lit(1.0)),
        4).as("quality_score"))
  }

  /** Token statistics under a BPE-ish regex tokenizer (letter runs, digit
    * runs, single non-space symbols) alongside the whitespace tokenizer. */
  def tokenStats(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val ws = split(trim(col(textCol)), "\\s+")
    val bpe = expr(
      s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)")
    balancedDocs(docs).select(
      col(idCol),
      size(ws).cast("long").as("n_ws_tokens"),
      size(array_distinct(ws)).cast("long").as("n_unique_ws_tokens"),
      size(bpe).cast("long").as("n_bpe_tokens"),
      round(length(col(textCol)).cast("double") /
        greatest(size(bpe), lit(1)).cast("double"), 4).as("chars_per_bpe_token"))
  }

  /** Gopher-style repetition signals over word bigrams:
    * (doc_id, n_bigrams, distinct_bigrams, top_bigram_share, repetition).
    * `top_bigram_share` (most frequent bigram / all bigrams) and
    * `repetition` (1 − distinct/total) flag boilerplate, template and
    * looped text that length/stopword ratios miss — a standard pretraining
    * quality rule alongside [[qualityScore]]. Docs with fewer than two
    * tokens have no bigrams and drop out (the oracle mirrors this).
    *
    * Shape (round-15): the statistics are PER-DOCUMENT, so the whole
    * operator is one codegen'd projection — zero shuffles. Bigrams ride
    * as sorted portable 60-bit hashes ([[graft.functions.TextFunctions.hash60]],
    * mirrored verbatim in the oracle so counts agree exactly even under a
    * hash collision); distinct count and the top-bigram multiplicity are
    * array-land run-length passes over the sorted hash array. The
    * previous explode + two-hash-aggregation form shuffled every bigram
    * twice — 16.7× DuckDB at sf1 on work a scan can do in place; at
    * 100 TB this shape is one pass with no exchange at all. The empty-doc
    * drop is a 1-element `filter` HOF under the explode (a computed
    * generator child keeps InferFiltersFromGenerate off, and no row-level
    * Filter means predicate pushdown can never re-inline the tokenize
    * chain below the projection barrier). */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    // tokens materialized into a column BEFORE the shingle lambda consumes
    // them (the re-evaluation trap documented on shinglesFromTokens).
    // Rebalance first: ALL of this operator's work is per-row and there is
    // no downstream exchange to spread it, so a small single-file corpus
    // would hash+sort every bigram on one core (the shingleRows lesson).
    graft.plans.NgramHash60.register(docs.sparkSession)
    graft.plans.Tokenize.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val hashed = balanced
      .select(col(idCol).as("doc_id"), tokensFast(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        array_sort(ngramHash60(col("__toks"), 2)).as("__bh"))
    // max run length over the sorted hashes = top bigram multiplicity;
    // hash60 is non-negative, so -1 is a safe "no previous" sentinel
    def topRun(arr: Column): Column =
      aggregate(arr,
        struct(lit(-1L).as("p"), lit(0L).as("r"), lit(0L).as("b")),
        (acc, x) => {
          val run = when(x === acc.getField("p"), acc.getField("r") + 1L)
            .otherwise(lit(1L))
          struct(x.as("p"), run.as("r"), greatest(acc.getField("b"), run).as("b"))
        },
        acc => acc.getField("b"))
    val st = struct(
      size(col("__bh")).cast("long").as("nb"),
      size(array_distinct(col("__bh"))).cast("long").as("db"),
      topRun(col("__bh")).as("tp"))
    hashed
      .select(col("doc_id"),
        explode(filter(array(st), x => x.getField("nb") > 0)).as("st"))
      .select(col("doc_id"),
        col("st.nb").as("n_bigrams"),
        col("st.db").as("distinct_bigrams"),
        round(col("st.tp").cast("double") / col("st.nb"), 4).as("top_bigram_share"),
        round(lit(1.0) - col("st.db").cast("double") / col("st.nb"), 4)
          .as("repetition"))
  }

  /** Sliding-window token chunking (the RAG/embedding-ingest shape): each
    * document becomes overlapping chunks of `window` tokens starting every
    * `stride` tokens. `(doc_id, chunk_id, chunk_text, n_tokens)`; a doc
    * shorter than one window yields exactly one (possibly short) chunk.
    * Pure explode projection — no shuffle, codegen'd; chunking 100 TB is
    * one scan. */
  def chunkTokens(docs: DataFrame, window: Int = 64, stride: Int = 48,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    // tokens into a column first: a lambda consuming an unprojected split()
    // re-evaluates it per element (no CSE inside HOF lambdas)
    val toked = balancedDocs(docs)
      .select(col(idCol).as("doc_id"), tokensFast(col(textCol)).as("__toks"))
    val lastStart = greatest(
      ceil((size(col("__toks")) - lit(window)).cast("double") / stride).cast("int"),
      lit(0))
    toked
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lastStart),
          i => slice(col("__toks"), i * stride + 1, lit(window)))))
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).cast("long").as("n_tokens"))
  }

  /** Content-defined chunking (the token-level FastCDC analog): a chunk
    * boundary falls AT every token whose portable hash ≡ 0 (mod
    * `avgTokens`), so expected chunk length is `avgTokens` and — the
    * property fixed windows cannot give — boundaries are a function of
    * CONTENT, not position: editing a document re-chunks only up to the
    * first boundary after the edit, and every later chunk keeps its
    * fingerprint (spec-pinned). That stability is what makes chunk-hash
    * dedup work across crawl snapshots: yesterday's chunks still match
    * today's shifted bytes.
    *
    * Output: `(doc_id, chunk_id, begin_pos, n_tokens, chunk_hash)`,
    * `chunk_id` 0-based in document order, `begin_pos` 1-based token
    * index, `chunk_hash` = first 16 md5 hex chars of the
    * space-joined chunk.
    *
    * Shape: pure per-row array arithmetic — cut positions, starts and
    * ends all live in array-land, the generator child is a computed
    * expression (no InferFiltersFromGenerate), and there is NO shuffle:
    * chunking 100 TB is one codegen'd scan, same scale posture as
    * [[chunkTokens]]. The empty-doc guard keeps `sequence` total. */
  def cdcChunks(docs: DataFrame, avgTokens: Int = 16,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(avgTokens > 1, "avgTokens must be > 1")
    // empty-token filter: split of an all-whitespace doc yields [""], which
    // would chunk as one empty-token chunk while the oracle's list_filter
    // sees zero tokens
    val toked = balancedDocs(docs).select(col(idCol).as("doc_id"),
      filter(tokensFast(col(textCol)), tk => tk =!= "").as("__toks"))
    val t = col("__toks")
    val n = size(t)
    // portable boundary hash: md5 first 8 hex chars as integer (the
    // Sampling.hashUnit family — mirrors exactly in the oracle)
    def isCut(tok: Column) =
      conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % avgTokens === 0
    val cuts = when(n >= 1,
      filter(sequence(lit(1), n), i => isCut(element_at(t, i))))
      .otherwise(array().cast("array<int>"))
    val ends = when(size(col("__cuts")) > 0 &&
        element_at(col("__cuts"), -1) === n, col("__cuts"))
      .otherwise(concat(col("__cuts"), array(n)))
    // guard: an empty doc has no __ends, and slice(x, 1, size-1) must
    // never see a negative length
    val starts = when(size(col("__ends")) > 0,
      concat(array(lit(1)),
        transform(slice(col("__ends"), lit(1), size(col("__ends")) - 1), e => e + 1)))
      .otherwise(array().cast("array<int>"))
    toked
      .withColumn("__cuts", cuts)
      .withColumn("__ends", when(n >= 1, ends).otherwise(array().cast("array<int>")))
      .withColumn("__starts", starts)
      .select(col("doc_id"), col("__toks"),
        posexplode(zip_with(col("__starts"), col("__ends"),
          (s, e) => struct(s.as("b"), e.as("e")))))
      .filter(col("col.e").isNotNull) // zip_with pads the longer side with null
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        col("col.b").cast("long").as("begin_pos"),
        (col("col.e") - col("col.b") + 1).cast("long").as("n_tokens"),
        substring(md5(array_join(
          slice(col("__toks"), col("col.b"), col("col.e") - col("col.b") + 1),
          " ")), 1, 16).as("chunk_hash"))
  }

  /** Gopher §A1-style rule GATE (Rae et al. 2021): the hard-threshold
    * sibling of [[qualityScore]]'s soft composite. Production curation
    * pipelines apply both — the composite ranks, the rule table explains
    * WHICH rule dropped a document (auditable filtering, per-rule
    * fail counts drive threshold tuning). Emits raw signals, one boolean
    * per rule, and the conjunction:
    *
    *  - `r_word_count`: minWords ≤ n_words ≤ maxWords
    *  - `r_mean_word_len`: minMeanLen ≤ Σlen(word)/n_words ≤ maxMeanLen
    *  - `r_symbol_ratio`: (#'#' + #'...') / n_words ≤ maxSymbolRatio
    *  - `r_alpha_words`: words containing a letter / n_words ≥ minAlphaFrac
    *  - `r_stopwords`: ≥ minStopwords hits from the Gopher stop list
    *
    * Every signal is exact integer arithmetic followed by one double
    * division, so the whole table (booleans included) hash-matches the
    * DuckDB oracle; rule comparisons use UNROUNDED values, the published
    * ratio columns are rounded to 4. One codegen'd projection over the
    * scan — no shuffle, no UDF; gating 100 TB is one pass. */
  def gopherRules(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                  minStopwords: Int = 2): DataFrame = {
    // tokens materialized before the HOF lambdas consume them (the
    // re-evaluation trap documented on shinglesFromTokens)
    val toked = balancedDocs(docs).select(col(idCol).as("doc_id"),
      lower(trim(col(textCol))).as("__txt"),
      filter(tokensFast(col(textCol)), t => t =!= "").as("__toks"))
    val t = col("__toks")
    val n = size(t).cast("long")
    val sumLen = aggregate(transform(t, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nStop = size(filter(t, w => w.isin(GopherStopwords: _*))).cast("long")
    val nAlpha = size(filter(t, w => w.rlike("[a-z]"))).cast("long")
    val nHash = (length(col("__txt")) -
      length(call_function("replace", col("__txt"), lit("#"), lit("")))).cast("long")
    val nEll = ((length(col("__txt")) -
      length(call_function("replace", col("__txt"), lit("..."), lit("")))) / 3).cast("long")
    val mean = sumLen.cast("double") / n
    val symRatio = (nHash + nEll).cast("double") / n
    val alphaFrac = nAlpha.cast("double") / n
    toked.select(
      col("doc_id"),
      n.as("n_words"),
      when(n > 0, round(mean, 4)).as("mean_word_len"),
      nStop.as("n_stopwords"),
      when(n > 0, round(alphaFrac, 4)).as("frac_alpha_words"),
      when(n > 0, round(symRatio, 4)).as("symbol_ratio"),
      (n >= minWords && n <= maxWords).as("r_word_count"),
      (n > 0 && mean >= minMeanLen && mean <= maxMeanLen).as("r_mean_word_len"),
      (n > 0 && symRatio <= maxSymbolRatio).as("r_symbol_ratio"),
      (n > 0 && alphaFrac >= minAlphaFrac).as("r_alpha_words"),
      (nStop >= minStopwords).as("r_stopwords"),
      (n >= minWords && n <= maxWords &&
        n > 0 && mean >= minMeanLen && mean <= maxMeanLen &&
        symRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac &&
        nStop >= minStopwords).as("keep"))
  }

  /** Gopher's stop list ("must contain ≥2 of…"): the word-level English
    * function words Rae et al. §A1.1 gate on. Shared with the oracle. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** N-gram novelty scoring: per document, the fraction of its DISTINCT
    * word trigrams whose global FIRST occurrence (min doc_id across the
    * corpus) is this document — the temporal-diversity signal a crawl
    * ingest uses to down-weight documents that only restate earlier
    * content (the dedup family answers "is this a copy?"; novelty answers
    * "how much of this have we seen before, at all?"). Documents with
    * fewer than 3 tokens have no trigrams and drop out (oracle mirrors).
    *
    * Scale shape (round 20 — guide §2.3, shuffle metadata not payloads):
    * ONE explode over the corpus (rebalanced via [[TextDedup.shingleRows]]'
    * conditional idiom) feeding ONE gram-keyed aggregation, and nothing
    * gram-stream-sized ever shuffles again. The previous shape joined the
    * raw gram stream back to the first-occurrence map and re-shuffled the
    * join output by doc — two full gram-stream exchanges plus a sort-merge
    * join. Both per-doc outputs are in fact derivable WITHOUT the join:
    *
    *  - `n_grams(d)` = the doc's distinct-gram count = `size(__shs)` — a
    *    projection, no aggregation needed. It rides the SAME exploded
    *    stream as one SENTINEL row per doc, keyed by `cast(doc_id as
    *    string)`: grams are `concat_ws(" ", w1, w2, w3)` and therefore
    *    always contain a space, a decimal doc id never does, so sentinel
    *    keys cannot collide with gram keys. Sentinel rows carry
    *    `pay = n_grams`; gram rows carry `pay = 0`.
    *  - `n_novel(d)` = #{gram : min_doc(gram) = d} — a doc-keyed count
    *    over the first-occurrence map itself (grams are distinct per doc
    *    via `array_distinct`, so the old per-gram indicator sum counts
    *    exactly one row per (doc, gram) — the same set).
    *
    * The one exchange carries map-side PARTIAL aggregates (gram, min, max)
    * instead of raw gram rows; both consumers (sentinels → per-doc sizes,
    * gram rows → novel counts) hang off that single aggregation, so AQE
    * stage reuse runs the tokenize+shingle map exactly once. Downstream
    * work is doc-cardinality. The first-occurrence map is gram-cardinality
    * sized; at 100 TB it shards across the cluster like any aggregation —
    * never a broadcast. Pinned equal to the join formulation in
    * `ExtensionSpec` ("noveltyScores: reshaped single-aggregation…").
    * PRECONDITION (as before, now structural): `idCol` is unique per row —
    * the sentinel key is the doc id. */
  def noveltyScores(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.{shinglesFromTokens, tokensFast}
    val spark = docs.sparkSession
    graft.plans.Tokenize.register(spark)
    val par = spark.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val unitType = "array<struct<key:string,pay:bigint>>"
    val units = balanced
      .select(col(idCol).as("doc_id"),
        shinglesFromTokens(tokensFast(col(textCol))).as("__shs"))
      .select(col("doc_id"), explode(
        when(size(col("__shs")) >= 1,
          concat(
            array(struct(col("doc_id").cast("string").as("key"),
              size(col("__shs")).cast("long").as("pay"))),
            transform(col("__shs"),
              s => struct(s.as("key"), lit(0L).as("pay")))))
          .otherwise(expr(s"CAST(array() AS $unitType)"))).as("u"))
      .select(col("doc_id"), col("u.key").as("key"), col("u.pay").as("pay"))
    val agg = units.groupBy(col("key"))
      .agg(min(col("doc_id")).as("__first"), max(col("pay")).as("__pay"))
    val perDoc = agg.filter(col("__pay") > 0)
      .select(col("__first").as("doc_id"), col("__pay").as("n_grams"))
    val novel = agg.filter(col("__pay") === 0)
      .groupBy(col("__first")).agg(count(lit(1)).as("n_novel"))
    val nNovel = coalesce(col("n_novel"), lit(0L))
    perDoc.join(novel, perDoc("doc_id") === novel("__first"), "left")
      .select(perDoc("doc_id"), col("n_grams"), nNovel.as("n_novel"),
        round(nNovel.cast("double") / col("n_grams"), 4).as("novelty"))
  }

  /** Compression-ratio quality signal: DEFLATE-compressed size over raw
    * UTF-8 size per document, with a repetitive-text gate at `maxRatio`
    * (boilerplate/machine-generated text compresses far below natural
    * prose — the compressibility heuristic of the Gopher/CCNet curation
    * family; complements [[repetitionStats]]' n-gram view with a
    * whole-document one that catches long-range repetition n-grams miss).
    *
    * One codegen'd projection over the scan — compressing 100 TB is one
    * pass, no shuffle (the kernel is [[graft.plans.DeflateSize]]; DEFLATE
    * runs ~100 MB/s/core, so this is compute-bound: size executors by
    * cores, not memory). Rows-only at the correctness gate: no SQL engine
    * exposes a deterministic DEFLATE length, so the signal's semantics are
    * property-tested in `CompressibilitySpec` instead.
    *
    * Output: `(doc_id, n_bytes, deflate_bytes, compress_ratio,
    * is_repetitive)`; empty docs get a null ratio and a false gate. */
  def compressionStats(docs: DataFrame, maxRatio: Double = 0.4,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.plans.DeflateSize.register(docs.sparkSession)
    val nBytes = octet_length(col(textCol)).cast("long")
    balancedDocs(docs)
      .select(col(idCol).as("doc_id"), nBytes.as("n_bytes"),
        expr(s"graft_deflate_len($textCol)").cast("long").as("deflate_bytes"))
      .withColumn("compress_ratio",
        when(col("n_bytes") > 0,
          round(col("deflate_bytes").cast("double") / col("n_bytes"), 4)))
      .withColumn("is_repetitive",
        coalesce(col("compress_ratio") < maxRatio, lit(false)))
  }

  /** Corpus diversity report: distinct-n ratios (unique n-grams over total
    * n-grams, the "distinct-1/distinct-2" metric of Li et al. 2016) per
    * group, for each n in `ns` — the mix-level health check that catches a
    * source gone templated/degenerate (its distinct-2 collapses) before
    * per-document gates like [[repetitionStats]] would, since boilerplate
    * REPEATED ACROSS documents looks novel inside each one.
    *
    * Output: `(<groupCol>, n, total_ngrams, distinct_ngrams,
    * distinct_ratio)` — one row per (group, n); groups whose documents are
    * all shorter than n emit no row for that n.
    *
    * Shape: one tokenize pass; all levels ride ONE generator (an array of
    * (n, grams) structs, so the scan is not re-read per level), then one
    * (group, n) aggregate with a single `countDistinct` — one distinct
    * column keeps the plan on hash aggregation (the multi-distinct Expand
    * + SortAggregate trap). Grams ride as portable 60-bit hashes
    * ([[graft.functions.TextFunctions.hash60]], round-15): the distinct
    * aggregation keys on fixed-width longs instead of variable-length
    * strings and the shuffle moves 8 bytes per gram — the string form was
    * 8.8× DuckDB at sf1 on exactly this aggregation. The oracle counts
    * the IDENTICAL hashes, so totals and distincts agree exactly by
    * construction (a cross-engine mismatch would need the two engines'
    * md5 to differ, not a collision). At 100 TB the exact distinct
    * shuffles every gram hash once; the approx path swaps `countDistinct`
    * for the q42 HLL sketch at the same shape. The short-doc guard lives
    * INSIDE the expression (`sequence(1, size−n+1)` must never see
    * size < n — it would generate a DESCENDING range). */
  def distinctNgramStats(docs: DataFrame, ns: Seq[Int] = Seq(1, 2, 3),
                         groupCol: String = "source",
                         textCol: String = "text"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    graft.plans.NgramHash60.register(docs.sparkSession)
    graft.plans.Tokenize.register(docs.sparkSession)
    val toks = col("__toks")
    // the kernel yields an empty array for docs shorter than n — the
    // short-doc guard lives inside it
    val levels = ns.map { n =>
      struct(lit(n).as("n"), ngramHash60(toks, n).as("grams"))
    }
    // gram construction + hashing run BEFORE the aggregation exchange, so
    // their parallelism is the scan's — rebalance a small single-file
    // corpus off one core (the shingleRows conditional idiom)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    balanced
      .select(col(groupCol).as("__grp"),
        filter(tokensFast(col(textCol)), t => t =!= "").as("__toks"))
      .select(col("__grp"), explode(array(levels: _*)).as("__lvl"))
      .select(col("__grp"), col("__lvl.n").as("n"),
        explode(col("__lvl.grams")).as("__gram"))
      // two-level aggregation instead of count + countDistinct in one agg
      // (round-19): the mixed form plans an Expand that doubles the gram
      // stream before aggregating; level 1 collapses to distinct
      // (group, n, gram) rows with map-side combine, level 2 is
      // vocabulary-sized. Identical exact integers.
      .groupBy(col("__grp"), col("n"), col("__gram"))
      .agg(count(lit(1)).as("__c"))
      .groupBy("__grp", "n")
      .agg(sum(col("__c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .select(col("__grp").as(groupCol), col("n"), col("total_ngrams"),
        col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") / col("total_ngrams"), 4)
          .as("distinct_ratio"))
  }
}
