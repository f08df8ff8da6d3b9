package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{hash60Fast, tokens, tokensFast}

/** Targeted data selection for LLM pretraining mixes: DSIR-style
  * importance weights (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling") under hashed-n-gram bag-of-words
  * models.
  *
  * The raw corpus is scored against a TARGET distribution (the data you
  * want more of — here a predicate over the corpus itself, e.g. one
  * language or one source domain): each document's log importance weight
  * is `log p_target(doc) − log p_raw(doc)` under two unigram models over
  * HASHED token buckets. Hashing fixes the feature space to `buckets`
  * dimensions regardless of vocabulary size — the property that makes the
  * method tractable at corpus scale (the model is a `buckets`-row table,
  * not a vocabulary).
  *
  * Scale shape (round-15, fused): ONE tokenize pass builds a PERSISTED
  * compact per-document `(bucket, tf)` run-length frame — computed
  * entirely per row (sorted bucket hashes + an array-land run-length
  * encode), so the corpus is never exploded and never shuffled. The
  * bucket model is one aggregation over that frame (`buckets` rows to
  * the driver — a bounded collect, same census class as k-means
  * centroids), and scoring is a second SHUFFLE-FREE projection over the
  * cached frame with the per-bucket log-deltas inlined as a `buckets`-
  * element literal array. No vocabulary-sized shuffle, no data-sized
  * collect, no join anywhere. */
object DataSelection {

  /** Per-document DSIR log importance weight.
    *
    * Model: `p(b) = (c(b) + 1) / (N + buckets)` (add-one smoothing over
    * hashed buckets) for target and raw separately; the weight is
    * `Σ_b tf_b · (ln p_t(b) − ln p_r(b))`, rounded to 4 at the end only
    * (the q85 float discipline — exact-integer counts, one double log per
    * bucket, association-safe magnitudes).
    *
    * Output: `(doc_id, n_tokens, log_weight)`; documents with no tokens
    * emit no row. Positive weights read "more target-like than the raw
    * mix"; resampling by `exp(log_weight)` is [[Sampling.weightedMix]]'s
    * job downstream.
    *
    * Cache lifetime: the compact tf frame stays persisted because the
    * RETURNED frame reads it lazily — the caller owns the cache (drop it
    * via `spark.catalog.clearCache()` or by unpersisting after the final
    * action; the bench harness clears per pass). It is bounded by
    * `buckets` entries per document — strictly smaller than the text.
    *
    * @param isTarget row-level predicate over `docs` marking the target
    *                 distribution's examples (e.g. `col("lang") === "en"`).
    */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 256,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // Tokens → sorted bucket hashes, materialized to an attribute per
    // projection stage (the shinglesFromTokens lesson: a raw expression
    // referenced inside a later lambda re-evaluates per element).
    graft.plans.Hash60.register(docs.sparkSession)
    graft.plans.Tokenize.register(docs.sparkSession)
    // tokenize+hash+RLE run per row before any exchange — rebalance a
    // single-file corpus off one core (the shingleRows conditional idiom)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    val sorted = balanced
      .select(col(idCol).as("doc_id"), isTarget.as("__t"),
        array_sort(transform(filter(tokensFast(col(textCol)), t => t =!= ""),
          t => pmod(hash60Fast(t), lit(buckets.toLong)))).as("__sb"))
    // Per-row run-length encode of the sorted bucket array: positions
    // where the value changes are the run starts; tf = next start − start.
    // Guards: `sequence(1, 0)` DESCENDS in Spark (an empty doc must never
    // reach it), the i=1 branch is a lazy CASE (ANSI element_at(_, 0)
    // errors — Or does not short-circuit), and `when`'s then-branch keeps
    // element_at(__st, j+1) unevaluated at the last run.
    val sb = col("__sb")
    val starts = when(size(sb) > 0,
      filter(sequence(lit(1), size(sb)), i =>
        when(i === 1, lit(true))
          .otherwise(element_at(sb, i) =!= element_at(sb, i - 1))))
      .otherwise(array().cast("array<int>"))
    val rle = sorted
      .select(col("doc_id"), col("__t"), col("__sb"), starts.as("__st"))
      .select(col("doc_id"), col("__t"),
        when(size(col("__st")) > 0,
          transform(sequence(lit(1), size(col("__st"))), j =>
            struct(
              element_at(col("__sb"), element_at(col("__st"), j)).as("b"),
              (when(j < size(col("__st")), element_at(col("__st"), j + 1))
                .otherwise(size(col("__sb")) + 1) -
                element_at(col("__st"), j)).cast("long").as("tf"))))
          .otherwise(array().cast("array<struct<b:bigint,tf:bigint>>"))
          .as("__e"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Bucket model: ONE aggregation over the exploded compact entries
    // (map-side partial aggregation collapses to ≤ buckets rows per task).
    // The model is `buckets` rows — a BOUNDED collect; the per-bucket
    // log-delta is computed once per bucket in the driver, not once per
    // (doc, bucket) row on the cluster.
    val model = rle
      .select(col("__t"), explode(when(size(col("__e")) >= 0, col("__e"))).as("e"))
      .groupBy(col("e.b").as("b")).agg(
        sum(col("e.tf")).as("cs"),
        sum(when(col("__t"), col("e.tf")).otherwise(lit(0L))).as("ct"))
      .collect().map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    val s = model.values.map(_._1).sum
    val tt = model.values.map(_._2).sum
    val deltas = (0 until buckets).map { b =>
      val (cs, ct) = model.getOrElse(b, (0L, 0L))
      math.log((ct + 1).toDouble / (tt + buckets)) -
        math.log((cs + 1).toDouble / (s + buckets))
    }
    val deltaArr = array(deltas.map(lit(_)): _*)
    // Scoring: shuffle-free projection over the cached frame — each doc's
    // weight is an array-land Σ tf·Δ(b) over its own entries. Σtf in
    // exact longs; one double accumulation per doc in sorted-bucket order.
    rle
      .select(col("doc_id"),
        explode(filter(array(struct(
          aggregate(col("__e"), lit(0L), (a, e) => a + e.getField("tf"))
            .as("n_tokens"),
          (round(aggregate(col("__e"), lit(0.0), (a, e) =>
            a + e.getField("tf").cast("double") *
              element_at(deltaArr, e.getField("b").cast("int") + 1)), 4)
            // + 0.0 canonicalizes IEEE −0.0 after the round (the q125
            // lesson: a sum landing in (−5e−7, 0] rounds to a signed zero
            // whose sign the engines derive differently)
            + lit(0.0)).as("log_weight"))),
          x => x.getField("n_tokens") > 0)).as("st"))
      .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
        col("st.log_weight").as("log_weight"))
  }
}
