package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{hash60, tokens}

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
  * Scale shape: ONE tokenize pass feeds a (doc, bucket) term-frequency
  * aggregate (persisted — it is consumed by both the model build and the
  * scoring pass, and is bounded by `buckets` rows per document); both
  * bucket models come from ONE aggregate over that frame and join back by
  * broadcast (`buckets` rows). No vocabulary-sized shuffle, no driver
  * collect, no second scan of the corpus. */
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
    * @param isTarget row-level predicate over `docs` marking the target
    *                 distribution's examples (e.g. `col("lang") === "en"`).
    */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 256,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // Tokens projected to an attribute BEFORE the explode (the
    // shinglesFromTokens lesson: a raw split expression re-evaluates per
    // lambda reference), and the explode guard kept INSIDE the generator
    // (InferFiltersFromGenerate would re-inline the tokenizer into the
    // scan filter otherwise — the SpanDedup lesson).
    val tok = docs
      .select(col(idCol).as("doc_id"), isTarget.as("__t"),
        filter(tokens(col(textCol)), t => t =!= "").as("__terms"))
      .select(col("doc_id"), col("__t"),
        explode(when(size(col("__terms")) >= 0, col("__terms"))).as("term"))
    // (doc, bucket) term frequencies — ≤ `buckets` rows per document, the
    // only data-sized shuffle in the operator. __t rides along (it is a
    // function of doc_id, so the group key gains no cardinality).
    val tf = tok
      .select(col("doc_id"), col("__t"),
        pmod(hash60(col("term")), lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "__t", "b").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Both bucket models in ONE pass over tf: raw counts and target counts
    // per bucket. `buckets` rows — broadcast to the scorer.
    val model = tf.groupBy("b").agg(
      sum("tf").as("cs"),
      sum(when(col("__t"), col("tf")).otherwise(lit(0L))).as("ct"))
    val totals = model.agg(sum("cs").as("__s"), sum("ct").as("__tt"))
    val pT = (col("ct") + 1).cast("double") / (col("__tt") + buckets)
    val pR = (col("cs") + 1).cast("double") / (col("__s") + buckets)
    tf.join(broadcast(model), "b")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        // + 0.0 canonicalizes IEEE −0.0 after the round (the q125 lesson:
        // a sum landing in (−5e−7, 0] rounds to a signed zero whose sign
        // the engines derive differently, and the compare is textual)
        (round(sum(col("tf") * (log(pT) - log(pR))), 4) + lit(0.0))
          .as("log_weight"))
  }
}
