package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fingerprint, occurrences, tokens, tokensFast}

/** End-to-end corpus-curation funnel — the composition a user of the
  * reference pipeline actually runs over raw crawl data before training:
  *
  *   raw docs → language-ID gate → Gopher quality gate → exact dedup
  *           → per-source attrition report
  *
  * Stage semantics (cumulative — each stage only sees the previous
  * stage's survivors):
  *
  *   1. `s_lang`  — the [[TextAnalysis.langId]] marker-argmax prediction
  *      matches the document's DECLARED language (a crawl-metadata
  *      consistency check, the usual first cut).
  *   2. `s_gopher` — `s_lang` AND the [[TextAnalysis.gopherRules]]
  *      composite `keep` (word count, mean word length, symbol ratio,
  *      alpha fraction, stopword floor) at the same default thresholds.
  *   3. kept — `s_gopher` AND the doc is the canonical (minimum id)
  *      member of its whitespace-normalized exact-fingerprint group
  *      *among stage-2 survivors* — a filtered-out document never claims
  *      canonicality and thereby deletes a clean duplicate.
  *
  * The per-row formulas deliberately restate langId/gopherRules on the
  * shared [[graft.functions.TextFunctions]] primitives instead of joining
  * those operators' outputs: three self-joins of the same scan on doc_id
  * would be three shuffles of the full corpus, where this plan is
  * scan → stacked projections (metrics materialized once, flags
  * referencing them as attributes — CollapseProject keeps the boundary
  * because the metric aliases are non-cheap) → ONE shuffle by fingerprint
  * (window min for the canonical id) → one tiny aggregate by source.
  * `CurationSpec` pins flag-level agreement with langId/gopherRules so
  * the restated formulas cannot drift.
  *
  * Scale shape: at 100 TB this is the cheapest correct funnel — all
  * gates are codegen'd per-row work on the scan, the only data-sized
  * shuffle keys on the exact fingerprint (uniform md5, no skew), and the
  * report aggregate is map-side combined down to #sources rows.
  */
object Curation {

  /** Per-row stage flags: (doc_id, stratum, n_words, fingerprint,
    * predicted_lang, s_lang, gopher_keep, s_gopher). Exposed for the
    * differential spec; [[pipeline]] builds its report on top. */
  def stageFlags(docs: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 declaredLangCol: String = "lang", stratumCol: String = "source",
                 minWords: Int = 50, maxWords: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
                 minStopwords: Int = 2): DataFrame = {
    val langs = TextAnalysis.langMarkers.map(_._1)
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))

    // conditional rebalance (the round-15 single-partition lesson): the
    // whole stage-flag computation is per-row and pre-exchange
    graft.plans.Tokenize.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs

    // projection 1: raw text derivations, each evaluated exactly once
    val base = balanced.select(
      Seq(col(idCol).as("doc_id"), col(stratumCol).as("stratum"),
        col(declaredLangCol).as("declared_lang"),
        lower(trim(col(textCol))).as("__txt"),
        filter(tokensFast(col(textCol)), t => t =!= "").as("__toks"),
        fingerprint(col(textCol)).as("fingerprint")) ++
      TextAnalysis.langMarkers.map { case (l, ms) =>
        ms.map(m => occurrences(padded, m)).reduce(_ + _).as(s"cnt_$l")
      }: _*)

    // projection 2: token/char aggregates (formulas mirror gopherRules
    // verbatim — pinned by CurationSpec)
    val t = col("__toks")
    val metrics = base.select(
      Seq(col("doc_id"), col("stratum"), col("declared_lang"), col("fingerprint"),
        size(t).cast("long").as("n_words"),
        aggregate(transform(t, w => length(w).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sum_len"),
        size(filter(t, w => w.isin(TextAnalysis.GopherStopwords: _*)))
          .cast("long").as("n_stop"),
        size(filter(t, w => w.rlike("[a-z]"))).cast("long").as("n_alpha"),
        (length(col("__txt")) -
          length(call_function("replace", col("__txt"), lit("#"), lit(""))))
          .cast("long").as("n_hash"),
        ((length(col("__txt")) -
          length(call_function("replace", col("__txt"), lit("..."), lit("")))) / 3)
          .cast("long").as("n_ell")) ++
      langs.map(l => col(s"cnt_$l")): _*)

    // projection 3: stage flags over materialized metric attributes.
    // predicted_lang is the same priority-ordered argmax as langId.
    val predicted = langs.foldRight(lit("unknown")) { (l, els) =>
      val c = col(s"cnt_$l")
      val beatsRest = langs.filterNot(_ == l)
        .map(o => c >= col(s"cnt_$o")).reduce(_ && _)
      when(c > 0 && beatsRest, lit(l)).otherwise(els)
    }
    val n = col("n_words")
    val mean = col("sum_len").cast("double") / n
    val symRatio = (col("n_hash") + col("n_ell")).cast("double") / n
    val alphaFrac = col("n_alpha").cast("double") / n
    val gopherKeep = n >= minWords && n <= maxWords &&
      n > 0 && mean >= minMeanLen && mean <= maxMeanLen &&
      symRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac &&
      col("n_stop") >= minStopwords
    metrics
      .withColumn("predicted_lang", predicted)
      .withColumn("s_lang", col("predicted_lang") === col("declared_lang"))
      .withColumn("gopher_keep", gopherKeep)
      .withColumn("s_gopher", col("s_lang") && col("gopher_keep"))
      .select("doc_id", "stratum", "n_words", "fingerprint",
        "predicted_lang", "s_lang", "gopher_keep", "s_gopher")
  }

  /** Per-source funnel report: (source, n_input, n_lang, n_gopher,
    * n_kept, words_kept), ordered by source. */
  def pipeline(docs: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               declaredLangCol: String = "lang", stratumCol: String = "source",
               minWords: Int = 50, maxWords: Int = 100000,
               minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
               maxSymbolRatio: Double = 0.1, minAlphaFrac: Double = 0.8,
               minStopwords: Int = 2): DataFrame = {
    val flags = stageFlags(docs, idCol, textCol, declaredLangCol, stratumCol,
      minWords, maxWords, minMeanLen, maxMeanLen, maxSymbolRatio,
      minAlphaFrac, minStopwords)
    // canonical id among stage-2 survivors of the fingerprint group: the
    // one data-sized shuffle (uniform md5 key)
    val w = Window.partitionBy(col("fingerprint"))
    val kept = col("s_gopher") &&
      col("doc_id") === min(when(col("s_gopher"), col("doc_id"))).over(w)
    flags
      .withColumn("__kept", kept)
      .groupBy(col("stratum").as("source"))
      .agg(
        count(lit(1)).as("n_input"),
        sum(when(col("s_lang"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("s_gopher"), 1L).otherwise(0L)).as("n_gopher"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(col("__kept"), col("n_words"))), lit(0L))
          .as("words_kept"))
      .orderBy("source")
  }
}
