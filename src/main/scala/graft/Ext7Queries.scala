package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 late additions — composition and vector-pipeline operators,
  * all full-oracle:
  *
  *  - q123 curation pipeline ([[graft.operators.Curation.pipeline]]) —
  *    the end-to-end funnel (langid gate → Gopher gate → exact dedup →
  *    per-source attrition report): the "switch your pipeline to this
  *    library" flagship, with every stage formula mirrored in one
  *    composed oracle CTE chain.
  *  - q124 hard-negative mining ([[graft.operators.Similarity.hardNegatives]])
  *    — per-query top-k cosine among different-label vectors, the
  *    contrastive-training pair generator; salted two-phase top-k.
  *  - q125 random projection ([[graft.operators.Similarity.randomProjection]])
  *    — deterministic sign-matrix Johnson–Lindenstrauss reduction,
  *    bit-reproducible across engines via the md5 hash family.
  *  - q126 scalar quantization error
  *    ([[graft.operators.VectorCompress.scalarQuantizeError]]) — the
  *    int8-storage-codec reconstruction report; stats pass is dim-bounded,
  *    codec pass is one codegen projection.
  *  - q127 vocabulary coverage curve
  *    ([[graft.operators.TermWeighting.vocabCoverage]]) — Zipf coverage at
  *    rank cutoffs for tokenizer vocab sizing; exact-integer cumulative
  *    arithmetic until one final divide.
  *  - q128 margin-based pair mining
  *    ([[graft.operators.Similarity.marginMining]]) — Artetxe–Schwenk
  *    margin scoring (cosine over the mean of both sides' top-k
  *    neighborhoods), the parallel-corpus mining criterion.
  */
object Ext7Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q123_curation_pipeline" -> ((s, dir) =>
      graft.operators.Curation.pipeline(t(s, dir, "documents"))),

    "q124_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      graft.operators.Similarity.hardNegatives(emb, q, k = 3)
    }),

    "q125_random_projection" -> ((s, dir) =>
      graft.operators.Similarity.randomProjection(t(s, dir, "embeddings"))),

    "q126_scalar_quantize" -> ((s, dir) =>
      graft.operators.VectorCompress.scalarQuantizeError(t(s, dir, "embeddings"))),

    // Cutoffs start at 5 because the synthetic corpus is Zipf over a small
    // vocabulary — the dense low ranks are where its curve actually bends.
    "q127_vocab_coverage" -> ((s, dir) =>
      graft.operators.TermWeighting.vocabCoverage(t(s, dir, "documents"),
        ranks = Seq(5, 10, 25, 50, 100, 1000, 5000))),

    // Even-label sampled queries vs the full odd-label side: the label
    // split stands in for the two corpora being mined against each other.
    "q128_margin_mining" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("label") % 2 === 0 && col("vec_id") % 40 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      graft.operators.Similarity.marginMining(
        emb.filter(col("label") % 2 === 1), q)
    })
  )

  // ------------------------------------------------------------------ oracles

  /** q123's oracle: the funnel stages as one CTE chain. Formulas are the
    * q26 langid counts, the q113 Gopher metrics, and the q18 fingerprint,
    * composed; the dedup canonical is the min doc_id among stage-2
    * survivors per fingerprint (window-min over a CASE, ignoring NULLs on
    * both engines). */
  private def curationOracle: String = {
    def cnt(markers: Seq[String]): String = markers.map { m =>
      s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INTEGER)"
    }.mkString(" + ")
    val langs = graft.operators.TextAnalysis.langMarkers
    val cols = langs.map { case (l, ms) => s"${cnt(ms)} AS cnt_$l" }.mkString(", ")
    val names = langs.map(_._1)
    val cases = names.map { l =>
      val beats = names.filterNot(_ == l).map(o => s"cnt_$l >= cnt_$o").mkString(" AND ")
      s"WHEN cnt_$l > 0 AND $beats THEN '$l'"
    }.mkString(" ")
    s"""WITH base AS (
          SELECT doc_id, source, lang,
                 lower(trim(text)) AS txt,
                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '') AS t,
                 md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
                 ' '||lower(text)||' ' AS p
          FROM documents),
        cnts AS (SELECT *, $cols FROM base),
        m AS (
          SELECT doc_id, source, lang, fingerprint,
                 ${names.map(l => s"cnt_$l").mkString(", ")},
                 CAST(len(t) AS BIGINT) AS n_words,
                 CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0)
                      AS BIGINT) AS sum_len,
                 CAST(len(list_filter(t, x -> list_contains(
                   ['the','be','to','of','and','that','have','with'], x)))
                      AS BIGINT) AS n_stop,
                 CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
                      AS BIGINT) AS n_alpha,
                 CAST(length(txt) - length(replace(txt, '#', ''))
                      AS BIGINT) AS n_hash,
                 CAST((length(txt) - length(replace(txt, '...', ''))) / 3
                      AS BIGINT) AS n_ell
          FROM cnts),
        f AS (
          SELECT *,
                 (CASE $cases ELSE 'unknown' END) = lang AS s_lang,
                 (n_words >= 50 AND n_words <= 100000 AND n_words > 0
                  AND (CAST(sum_len AS DOUBLE) / n_words) >= 3.0
                  AND (CAST(sum_len AS DOUBLE) / n_words) <= 10.0
                  AND (CAST(n_hash + n_ell AS DOUBLE) / n_words) <= 0.1
                  AND (CAST(n_alpha AS DOUBLE) / n_words) >= 0.8
                  AND n_stop >= 2) AS gopher_keep
          FROM m),
        g AS (SELECT *, (s_lang AND gopher_keep) AS s_gopher FROM f),
        d AS (
          SELECT *, min(CASE WHEN s_gopher THEN doc_id END)
                      OVER (PARTITION BY fingerprint) AS canonical_id
          FROM g)
        SELECT source, count(*) AS n_input,
               CAST(sum(CASE WHEN s_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
               CAST(sum(CASE WHEN s_gopher THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
               CAST(sum(CASE WHEN s_gopher AND doc_id = canonical_id
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(coalesce(sum(CASE WHEN s_gopher AND doc_id = canonical_id
                                 THEN n_words END), 0) AS BIGINT) AS words_kept
        FROM d GROUP BY source"""
  }

  /** q125's sign matrix in SQL: parity of the first 8 md5 hex chars of
    * 'rp|j|i' — the same bits [[graft.operators.Similarity.randomProjection]]
    * derives on the driver. Left-to-right list_sum mirrors the HOF
    * aggregate's association order; the `+ 0.0` canonicalizes −0.0 like
    * the Spark side. */
  private def projectionOracle: String =
    """SELECT vec_id, j AS dim,
         round(list_sum([CAST(embedding[i+1] AS DOUBLE) *
                 (CASE WHEN ('0x'||substr(md5('rp|'||j||'|'||i),1,8))::BIGINT % 2 = 0
                       THEN 1.0 ELSE -1.0 END)
                 for i in range(0, 64)]) / 4, 6) + 0.0 AS value
       FROM embeddings, range(16) tj(j)"""

  val oracles: Map[String, String] = Map(
    "q123_curation_pipeline" -> curationOracle,

    // Same cosine formulation as q23's oracle (proven bit-compatible with
    // the native kernel); ranking on the 6-place-QUANTIZED cosine with
    // vec_id tiebreak on both engines (the marginMining discipline —
    // round-13 advisor: raw-double ranking made parity depend on
    // bit-identical kernels rather than the 6-place contract).
    "q124_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
                    FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.qid, e.vec_id,
             round(
               list_sum([CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE) for p in list_zip(e.embedding, q.qv)]) /
               (sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in e.embedding])) *
                sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) for x in q.qv]))), 6) AS c6
           FROM embeddings e, q
           WHERE e.label <> q.qlabel AND e.vec_id <> q.qid),
         r AS (SELECT qid, vec_id, c6,
                 row_number() OVER (PARTITION BY qid ORDER BY c6 DESC, vec_id)
                   AS rank
               FROM scored)
         SELECT qid, rank, vec_id AS neg_id, c6 AS cosine
         FROM r WHERE rank <= 3""",

    "q125_random_projection" -> projectionOracle,

    // q126: same [lo,hi] stats, same floor(t+0.5) code, same association
    // order as scalarQuantizeError; the error list is computed once in its
    // own CTE (mirrors the projected __e column) and folded left-to-right.
    "q126_scalar_quantize" ->
      """WITH e AS (SELECT vec_id,
                      [CAST(x AS DOUBLE) FOR x IN embedding] AS v
                    FROM embeddings),
         ex AS (SELECT vec_id, i, v[i+1] AS x FROM e, range(0, 64) t(i)),
         s AS (SELECT i, min(x) AS lo, max(x) AS hi FROM ex GROUP BY i),
         a AS (SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi
               FROM s),
         er AS (SELECT vec_id,
                  [v[i+1] - (CASE WHEN a.hi[i+1] = a.lo[i+1] THEN a.lo[i+1]
                     ELSE a.lo[i+1] +
                       least(255.0, greatest(0.0,
                         floor((v[i+1] - a.lo[i+1]) * 255.0 /
                               (a.hi[i+1] - a.lo[i+1]) + 0.5)))
                       * (a.hi[i+1] - a.lo[i+1]) / 255.0 END)
                   FOR i IN range(0, 64)] AS errs
                FROM e, a)
         SELECT vec_id,
                round(list_sum([d * d FOR d IN errs]) / len(errs), 6) AS mse,
                round(list_max([abs(d) FOR d IN errs]), 6) AS max_abs_err
         FROM er""",

    // q127: cnt sums wrapped BIGINT (DuckDB sum(BIGINT) is HUGEINT);
    // ranks over the FULL vocabulary equal the Spark top-maxRank + rank
    // because both use the unique (cnt desc, term asc) total order.
    "q127_vocab_coverage" ->
      """WITH tok AS (
           SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
                                                        '\s+'),
                         x -> x <> '')) AS term
           FROM documents),
         counts AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
         tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
         r AS (SELECT term, cnt,
                 row_number() OVER (ORDER BY cnt DESC, term) AS rnk,
                 sum(cnt) OVER (ORDER BY cnt DESC, term
                                ROWS UNBOUNDED PRECEDING) AS cum
               FROM counts)
         SELECT rnk AS vocab_rank, CAST(cum AS BIGINT) AS cum_tokens,
                round(CAST(cum AS DOUBLE) / total, 6) AS coverage
         FROM r, tot WHERE rnk IN (5, 10, 25, 50, 100, 1000, 5000)""",

    // q128: the q23/q124 cosine formulation (bit-compatible with the
    // native kernel), quantized to 6 places before the sum/count averages
    // (count after the rank<=k filter IS least(k, neighborhood) — round-13
    // advisor: a bare /k deflates short neighborhoods); a zero mean-
    // neighborhood maps the margin to 0.0 explicitly on both engines;
    // margin parenthesization mirrors the operator exactly.
    "q128_margin_mining" ->
      """WITH x AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
                    WHERE label % 2 = 0 AND vec_id % 40 = 0),
         y AS (SELECT vec_id, embedding FROM embeddings WHERE label % 2 = 1),
         sc AS (
           SELECT x.qid, y.vec_id,
             round(
               list_sum([CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)
                         for p in list_zip(y.embedding, x.qv)]) /
               (sqrt(list_sum([CAST(v AS DOUBLE)*CAST(v AS DOUBLE)
                               for v in y.embedding])) *
                sqrt(list_sum([CAST(v AS DOUBLE)*CAST(v AS DOUBLE)
                               for v in x.qv]))), 6) AS c6
           FROM y, x),
         rx AS (SELECT qid, vec_id, c6,
                  row_number() OVER (PARTITION BY qid
                                     ORDER BY c6 DESC, vec_id) AS rnx
                FROM sc),
         dx AS (SELECT qid, sum(c6) / count(*) AS dx FROM rx
                WHERE rnx <= 4 GROUP BY qid),
         ry AS (SELECT qid, vec_id, c6,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c6 DESC, qid) AS rny
                FROM sc),
         dy AS (SELECT vec_id, sum(c6) / count(*) AS dy FROM ry
                WHERE rny <= 4 GROUP BY vec_id),
         m AS (SELECT sc.qid, sc.vec_id, sc.c6,
                 CASE WHEN (dx.dx + dy.dy) / 2 = 0 THEN 0.0
                      ELSE round(sc.c6 / ((dx.dx + dy.dy) / 2), 6) END AS mg
               FROM sc JOIN dx USING (qid) JOIN dy USING (vec_id))
         SELECT qid, vec_id AS cand_id, c6 + 0.0 AS cosine, mg + 0.0 AS margin
         FROM m ORDER BY mg DESC, qid, vec_id LIMIT 25"""
  )
}
