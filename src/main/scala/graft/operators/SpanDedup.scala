package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, tokensFast}

/** Exact-substring (span-level) deduplication — the missing granularity
  * between document-level dedup ([[TextDedup]]: exact / MinHash / SimHash /
  * Jaccard / winnowing) and within-document repetition ([[TextAnalysis]]
  * q51): find the *regions of text* that are duplicated across documents and
  * optionally remove every occurrence but one, in the style of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et al.,
  * 2021). The reference engine has no span-level operator at all
  * (reference etl/transform.py deduplicates whole records by id only); this
  * is part of the training-data extension surface.
  *
  * Lee et al. build a corpus-wide suffix array — inherently single-machine.
  * The distributed re-expression indexes token k-grams instead: a duplicated
  * substring of length ≥ k tokens is exactly a maximal run of duplicated
  * k-grams, so grouping gram occurrences by hash and merging overlapping hits
  * back per document recovers every duplicated span of length ≥ k with no
  * quadratic pair enumeration and no global ordering:
  *
  *   1. one projection emits (doc, pos, gramHash) via a position-indexed
  *      `transform` over the token array (the generator child is a computed
  *      expression, so `InferFiltersFromGenerate` cannot re-inline the
  *      tokenize chain as a scan filter — the q22 landmine);
  *   2. ONE shuffle groups occurrences into per-gram buckets; a bucket is
  *      cross-document iff min(doc) != max(doc) — every occurrence in such a
  *      bucket has a twin in another document, so the whole bucket is
  *      emitted in place (no join back);
  *   3. per-document gaps-and-islands (window + two same-key aggregations,
  *      ONE more shuffle: `HashPartitioning(doc)` already satisfies the
  *      `(doc, island)` and `(doc)` groupings) merges hits `[p, p+k)` into
  *      maximal spans — hits `p`, `q` coalesce iff `q - p <= k`.
  *
  * At 100 TB the only skew risk is an ubiquitous boilerplate gram producing
  * a giant bucket; `maxGramDf` drops buckets above a document-frequency cap
  * (the standard frequent-shingle prune, same rationale as
  * [[TextDedup.dfCapFor]] — a gram shared by thousands of documents is
  * boilerplate, not signal, and its span survives via its rarer neighbours).
  *
  * Hashes are the portable `substr(md5, 1, 16)` family so every output is
  * bit-reproducible in the DuckDB oracle.
  */
object SpanDedup {

  /** (doc_id, pos, g) rows, 1-based positions, g = `substr(md5(space-joined
    * k tokens), 1, 16)` — mirrored verbatim by the oracle's
    * `substr(md5(array_to_string(t[i:i+k-1], ' ')), 1, 16)`.
    *
    * Gram hashes come from the fused [[graft.plans.GramMd5Prefix16]] kernel
    * (round-19): the declarative
    * `transform(sequence(...), i -> substring(md5(concat_ws(slice(...)))))`
    * chain allocated a sliced array, a joined string, a 32-char hex string
    * and a substring per gram — the measured majority of q100/q101's one
    * heavy map stage. Identical values (differential-pinned in
    * SpanDedupSpec), so the committed oracles are untouched. Tokens are
    * materialized in their own projection before the generator consumes
    * them (the [[TextDedup.shingleRows]] boundary); short docs yield an
    * empty array inside the kernel, keeping the guard out of Filter
    * position (the InferFiltersFromGenerate landmine, PlanShapeSpec). */
  private def gramRows(docs: DataFrame, k: Int, idCol: String, textCol: String): DataFrame = {
    // the tokenize+md5 map side runs BEFORE the bucket shuffle, so its
    // parallelism is the SCAN's: a small single-file input means one
    // partition doing all the hashing on one core (measured: >half of
    // q100's wall). Rebalance only when the scan undersupplies the
    // cluster — a many-split 100 TB input takes the free path, no extra
    // corpus shuffle (same starvation guard as Multimodal.pngPayloadFromId).
    graft.plans.Tokenize.register(docs.sparkSession)
    graft.plans.GramMd5Prefix16.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    balanced
      .select(col(idCol).as("doc_id"), tokensFast(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        call_function("graft_gram_md5_16", col("__toks"), lit(k)).as("__gs"))
      // when(size>=0) blocks InferFiltersFromGenerate from re-inlining the
      // kernel call as a scan filter (the q22 landmine / noInfer idiom)
      .select(col("doc_id"),
        posexplode(when(size(col("__gs")) >= 0, col("__gs"))).as(Seq("pos0", "g")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("g"))
  }

  /** Occurrences of cross-document duplicated k-grams: (doc_id, pos) for
    * every gram occurrence whose gram also appears in a DIFFERENT document.
    * One shuffle: per-gram buckets via groupBy(g), emitted in place.
    *
    * When `dropCanonical` is set, the lexicographically first occurrence
    * (min (doc_id, pos)) of each gram is withheld — the hit set then covers
    * exactly the text a remove-all-but-one dedup pass deletes. */
  private def dupHits(grams: DataFrame, maxGramDf: Int, dropCanonical: Boolean): DataFrame = {
    val bucket = grams
      .groupBy(col("g"))
      .agg(collect_list(struct(col("doc_id"), col("pos"))).as("hits"),
        min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
      .filter(col("__mn") =!= col("__mx") && size(col("hits")) <= maxGramDf)
    val opened =
      if (!dropCanonical) bucket.select(explode(col("hits")).as("h"))
      else bucket
        .withColumn("__first", array_min(col("hits")))
        .select(explode(col("hits")).as("h"), col("__first"))
        .filter(col("h") =!= col("__first"))
    opened.select(col("h.doc_id").as("doc_id"), col("h.pos").as("pos"))
  }

  /** Maximal duplicated spans per (doc, hit set): gaps-and-islands over the
    * hit positions. Output one row per span: (doc_id, lo, hi) in 1-based
    * inclusive token indices. */
  private def spans(hits: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("__gap",
        when(col("pos") - coalesce(lag("pos", 1).over(byDoc), col("pos")) > k, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__gap")).over(byDoc))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("pos")).as("lo"), (max(col("pos")) + (k - 1)).as("hi"))
  }

  /** Per-document duplicated-span statistics: for every document carrying at
    * least one cross-document duplicated k-gram, the number of maximal
    * duplicated spans and the total tokens they cover.
    *
    * Output: (doc_id, n_dup_spans, dup_tokens) ordered by doc_id. */
  def duplicateSpans(docs: DataFrame, k: Int = 8, maxGramDf: Int = 1000,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    spans(dupHits(gramRows(docs, k, idCol, textCol), maxGramDf, dropCanonical = false), k)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("hi") - col("lo") + 1).as("dup_tokens"))
      .orderBy(col("doc_id"))

  /** Remove-all-but-one span dedup: delete every token covered by a
    * NON-canonical occurrence of a cross-document duplicated k-gram (the
    * canonical occurrence — corpus-wide min (doc_id, pos) — survives, so one
    * copy of every duplicated substring remains, à la Lee et al. §3.2).
    *
    * Reconstruction stays at the array level: removal spans per document are
    * few, so they are collected into a small array, joined back to the
    * documents (a shuffle join on doc_id — broadcast would collect an
    * unbounded span table to the driver at 100 TB), and applied with an
    * index-aware `filter` higher-order function over the token array. No
    * per-token explode of the full corpus.
    *
    * Output: (doc_id, clean_text, n_removed_tokens) for EVERY input
    * document, whitespace/case-normalized (clean_text is the space-joined
    * surviving tokens), ordered by doc_id. */
  def dedupReconstruct(docs: DataFrame, k: Int = 8, maxGramDf: Int = 1000,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val removal = spans(dupHits(gramRows(docs, k, idCol, textCol), maxGramDf, dropCanonical = true), k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("lo"), col("hi"))).as("__spans"))
    graft.plans.Tokenize.register(docs.sparkSession)
    docs
      .select(col(idCol).as("doc_id"), tokensFast(col(textCol)).as("__toks"))
      .join(removal, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        concat_ws(" ",
          filter(col("__toks"), (_, i) =>
            col("__spans").isNull ||
              !exists(col("__spans"), s => i + 1 >= s("lo") && i + 1 <= s("hi"))))
          .as("clean_text"),
        coalesce(
          aggregate(col("__spans"), lit(0L), (acc, s) => acc + s("hi") - s("lo") + 1),
          lit(0L)).as("n_removed_tokens"))
      .orderBy(col("doc_id"))
  }
}
