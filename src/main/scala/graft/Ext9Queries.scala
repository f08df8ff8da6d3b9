package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 additions — the training-mix curation trio:
  *
  *  - q131 leakage-safe train/val/test split: near-duplicate groups (the
  *    q50 LSH components) are the split unit, so no near-duplicate pair
  *    ever straddles train and test — the eval-contamination failure mode
  *    a row-hash split (q104) cannot prevent.
  *  - q132 DSIR importance weights ([[graft.operators.DataSelection]]):
  *    hashed-n-gram log p_target − log p_raw per document — the data
  *    SELECTION rung the funnel's filters (gates drop, weights rank).
  *  - q133 distinct-n diversity report
  *    ([[graft.operators.TextAnalysis.distinctNgramStats]]): per-source
  *    unique/total n-gram ratios — the mix-level degeneracy check.
  *
  * All three carry full DuckDB oracles (q131 composes the q50 recursive
  * components CTE with q104's split-hash formula; q132/q133 mirror the
  * md5 hash family and the q85 float discipline).
  */
object Ext9Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q132's hashed-feature dimension: the DSIR bucket count — the model is
    * a `DsirBuckets`-row table regardless of vocabulary size. Interpolated
    * into both the Spark call and the oracle SQL so the two can never
    * desync. */
  private val DsirBuckets = 256

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Group-aware split: hash the GROUP representative (q50's cluster_id,
    // = min doc_id of the LSH component), not the row — every member of a
    // near-duplicate cluster lands in the same band by construction, so
    // the 80/10/10 cut can never leak a near-duplicate of a training
    // document into test. Costs exactly the q50 group computation; the
    // split itself is one hash projection, no extra shuffle.
    "q131_leakage_safe_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val groups = graft.operators.TextDedup.minhashLshGroups(
        docs, k = ExtQueries.K, bands = ExtQueries.BANDS)
      graft.operators.Sampling.assignSplits(
        groups, col("cluster_id"), Ext5Queries.SplitBands)
    }),

    // DSIR importance weights against the English slice as the target
    // distribution (lang = 'en' — a stand-in for "high-quality reference
    // corpus"; the operator takes any row predicate over the corpus).
    "q132_dsir_weights" -> ((s, dir) =>
      graft.operators.DataSelection.dsirWeights(
        t(s, dir, "documents"), col("lang") === "en", buckets = DsirBuckets)),

    // Distinct-n diversity per source, n ∈ {1,2,3}.
    "q133_distinct_ngrams" -> ((s, dir) =>
      graft.operators.TextAnalysis.distinctNgramStats(
        t(s, dir, "documents"))),

    // MMR diversity re-rank of the brute top-20 pool for the standard
    // vec_id-0 query — the retrieved-context selection step of a RAG
    // pipeline. The oracle replays the same greedy loop as a recursive
    // CTE (tractable at oracle scale; the Spark side's pool collect is
    // poolSize-bounded at any corpus size).
    "q134_mmr_rerank" -> ((s, dir) =>
      graft.operators.Similarity.mmrRerank(
        t(s, dir, "embeddings").filter(col("vec_id") =!= 0),
        ExtQueries.queryVector(s, dir)))
  )

  // ------------------------------------------------------------------ oracles

  val oracles: Map[String, String] = Map(

    // The q50 recursive-CTE components feed q104's split-hash CASE — the
    // same 'graft|' seed, ppm quantizer, and LEFT-TO-RIGHT accumulated cut
    // points (0.8, then 0.8 + 0.1; never a fresh 0.9 literal).
    "q131_leakage_safe_split" ->
      s"""WITH RECURSIVE ${ExtQueries.lshGroupsCtes}
         |SELECT doc_id, cluster_id,
         |       CASE WHEN u < 0.8 THEN 'train'
         |            WHEN u < 0.8 + 0.1 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |             (('0x'||substr(md5('graft|'||cluster_id), 1, 8))::BIGINT
         |              % 1000000) / 1000000.0 AS u
         |      FROM groups) g""".stripMargin,

    // Exact-integer bucket counts under the shared 60-bit md5 family; one
    // double log per bucket; Σ tf·Δ rounded to 4 at the end only (the q85
    // discipline). Smoothing denominators spelled as the same
    // BIGINT + literal additions the Scala side performs.
    "q132_dsir_weights" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
         |  FROM documents
         |),
         |tk AS (
         |  SELECT doc_id, lang = 'en' AS t,
         |         ('0x'||substr(md5(w),1,15))::BIGINT % $DsirBuckets AS b
         |  FROM toks WHERE w <> ''
         |),
         |tf AS (
         |  SELECT doc_id, t, b, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2, 3
         |),
         |model AS (
         |  SELECT b, CAST(sum(tf) AS BIGINT) AS cs,
         |         CAST(sum(CASE WHEN t THEN tf ELSE 0 END) AS BIGINT) AS ct
         |  FROM tf GROUP BY b
         |),
         |tot AS (
         |  SELECT CAST(sum(cs) AS BIGINT) AS s, CAST(sum(ct) AS BIGINT) AS tt
         |  FROM model
         |)
         |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
         |       round(sum(tf * (ln(CAST(ct + 1 AS DOUBLE) / (tt + $DsirBuckets)) -
         |                       ln(CAST(cs + 1 AS DOUBLE) / (s + $DsirBuckets)))),
         |             4) + 0.0 AS log_weight
         |FROM tf JOIN model USING (b) CROSS JOIN tot
         |GROUP BY doc_id""".stripMargin,

    // Same tokenization (lower/trim/\s+/drop-empties), same space-joined
    // n-grams hashed through the portable md5-60bit family (round-15:
    // both engines count the SAME 60-bit hashes, so totals/distincts
    // agree exactly by construction); `range(1, len−n+2)` is empty when
    // the doc is shorter than n, mirroring the Spark side's in-expression
    // guard.
    "q133_distinct_ngrams" ->
      """WITH toks AS (
        |  SELECT source,
        |         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |                     w -> w <> '') AS tk
        |  FROM documents
        |),
        |grams AS (
        |  SELECT source, n,
        |         unnest(list_transform(range(1, len(tk) - n + 2),
        |                i -> ('0x'||substr(md5(array_to_string(tk[i:i+n-1], ' ')),
        |                      1, 15))::BIGINT)) AS gram
        |  FROM toks CROSS JOIN (SELECT unnest([1, 2, 3]) AS n) levels
        |)
        |SELECT source, n, CAST(count(*) AS BIGINT) AS total_ngrams,
        |       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
        |       round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 4)
        |         AS distinct_ratio
        |FROM grams GROUP BY source, n""".stripMargin,

    // Greedy MMR as a recursive CTE: each step LATERAL-picks the argmax
    // of 7·rel − 3·max(sim to picked) over the unpicked pool. rel/sim are
    // the q23 cosine formulation quantized to 6; the score is λ = 0.7
    // SCALED ×10 so it stays on the inputs' 1e-6 decimal grid (see
    // [[graft.operators.Similarity.mmrRerank]] — an unscaled 0.7·rel has
    // a 7th decimal landing on round-half ties the engines resolve
    // differently). Selection order (score desc, vec_id asc) is unique.
    // The weights, pool size and step bound are INTERPOLATED from the
    // Similarity constants the operator itself uses — changing the
    // operator defaults moves the oracle with it (round-14 advisor item).
    "q134_mmr_rerank" -> {
      import graft.operators.Similarity.{MmrK, MmrPool, MmrRelWeight, MmrSimWeight}
      s"""WITH RECURSIVE
        |n AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
        |      FROM embeddings),
        |q AS (SELECT v AS qv FROM n WHERE vec_id = 0),
        |cand AS (
        |  SELECT n.vec_id, n.v,
        |         round(list_sum([p[1]*p[2] for p in list_zip(n.v, q.qv)]) /
        |               (sqrt(list_sum([x*x for x in n.v])) *
        |                sqrt(list_sum([x*x for x in q.qv]))), 6) + 0.0 AS rel
        |  FROM n, q WHERE n.vec_id <> 0
        |  ORDER BY rel DESC, vec_id ASC LIMIT $MmrPool),
        |sims AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib,
        |         round(list_sum([p[1]*p[2] for p in list_zip(a.v, b.v)]) /
        |               (sqrt(list_sum([x*x for x in a.v])) *
        |                sqrt(list_sum([x*x for x in b.v]))), 6) + 0.0 AS sim
        |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
        |sel(step, vec_id, rel, mmr, picked) AS (
        |  (SELECT 1, vec_id, rel, round($MmrRelWeight*rel, 6) + 0.0, [vec_id]
        |   FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
        |  UNION ALL
        |  SELECT sel.step+1, nxt.vec_id, nxt.rel, nxt.mmr,
        |         list_append(sel.picked, nxt.vec_id)
        |  FROM sel, LATERAL (
        |    SELECT c.vec_id, c.rel,
        |           round($MmrRelWeight*c.rel -
        |                 $MmrSimWeight*(SELECT max(sim) FROM sims
        |                              WHERE ia = c.vec_id
        |                                AND list_contains(sel.picked, ib)),
        |                 6) + 0.0 AS mmr
        |    FROM cand c WHERE NOT list_contains(sel.picked, c.vec_id)
        |    ORDER BY mmr DESC, c.vec_id LIMIT 1) nxt
        |  WHERE sel.step < $MmrK)
        |SELECT step AS rank, vec_id, rel AS relevance, mmr AS mmr_score
        |FROM sel""".stripMargin
    }
  )
}
