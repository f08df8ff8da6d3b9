package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{DataQuality, Similarity, TermWeighting, TextAnalysis, TimeSeries}

/** Round-6 query surface: corpus term weighting (TF-IDF, heavy hitters) and
  * per-group anomaly detection — retrieval/curation primitives the earlier
  * text-analysis layer (q17/q26-q28) did not cover. Each has an exact DuckDB
  * twin; the fixed-memory Misra–Gries alternative to q75's exact count is
  * the `graft_approx_topk` native aggregate (spec-verified — its output is
  * merge-order-dependent by construction, so no cross-engine hash oracle
  * can apply). */
object Ext3Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Top-5 TF-IDF terms per document (keyword extraction). Rank orders by
    // the ROUNDED score then term, so ordering is reproducible cross-engine.
    "q74_tfidf_terms" -> ((s, dir) =>
      TermWeighting.tfidfTopTerms(t(s, dir, "documents"), topK = 5)),

    // Exact corpus-wide top-25 tokens (boilerplate/stopword discovery).
    // One explode + one map-side-combined aggregation + global top-k.
    "q75_heavy_hitters" -> ((s, dir) =>
      TermWeighting.heavyHitters(t(s, dir, "documents"), k = 25)),

    // Per-event-type 3-sigma outlier sweep over the event stream.
    "q76_outlier_summary" -> ((s, dir) =>
      DataQuality.zscoreOutlierSummary(t(s, dir, "events"), "event_type", "value")),

    // Time-series gap-fill: dense hourly grid per event type with
    // forward-filled values (215 gap rows exercised at sf0.01).
    "q77_gapfill" -> ((s, dir) =>
      TimeSeries.resample(t(s, dir, "events"), "event_type", "ts", "value")),

    // SemDeDup-style semantic dedup: components of the cosine≥0.3 sign-LSH
    // graph (q24's edge set), min-id canonical election.
    "q78_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedupGroups(t(s, dir, "embeddings"), threshold = 0.3)),

    // Robust median/MAD outlier sweep (modified z > 3.5) — the
    // contamination-resistant twin of q76.
    "q79_mad_outliers" -> ((s, dir) =>
      DataQuality.madOutlierSummary(t(s, dir, "events"), "event_type", "value")),

    // Compression-ratio quality signal (rows-only: no SQL engine exposes
    // a deterministic DEFLATE length — semantics are property-tested in
    // CompressibilitySpec; the driver records the rows>0 check).
    "q80_compressibility" -> ((s, dir) =>
      TextAnalysis.compressionStats(t(s, dir, "documents"))))

  /** Shared tokenizer twin: non-empty whitespace tokens of lower(trim(text)),
    * exactly [[graft.operators.TermWeighting]]'s `termsOf`. */
  private val sqlTok =
    """SELECT doc_id,
       unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                          x -> x <> '')) AS term
       FROM documents"""

  val oracles: Map[String, String] = Map(

    "q74_tfidf_terms" ->
      s"""WITH tok AS ($sqlTok),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
         wdf AS (SELECT doc_id, term, tf,
                        count(*) OVER (PARTITION BY term) AS df FROM tf),
         n AS (SELECT count(*) AS n FROM documents),
         scored AS (SELECT doc_id, term, tf,
                           round(tf * ln(CAST(n AS DOUBLE) / df), 4) AS tfidf
                    FROM wdf, n)
         SELECT doc_id, term, tf, tfidf, CAST(rk AS BIGINT) AS rk
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
               FROM scored)
         WHERE rk <= 5""",

    "q75_heavy_hitters" ->
      s"""WITH tok AS ($sqlTok)
         SELECT term, count(*) AS cnt FROM tok
         GROUP BY term ORDER BY cnt DESC, term LIMIT 25""",

    "q76_outlier_summary" ->
      """WITH stats AS (
           SELECT event_type, round(avg(value), 4) AS mean_r,
                  round(stddev_samp(value), 4) AS sd_r
           FROM events GROUP BY event_type)
         SELECT e.event_type, count(*) AS n_outliers,
                round(max(abs(e.value - s.mean_r) / s.sd_r), 4) AS max_z
         FROM events e JOIN stats s USING (event_type)
         WHERE s.sd_r > 0 AND abs(e.value - s.mean_r) > 3.0 * s.sd_r
         GROUP BY e.event_type""",

    "q77_gapfill" ->
      """WITH bucketed AS (
           SELECT event_type, date_trunc('hour', ts) AS bucket,
                  count(*) AS n_events, round(sum(value), 4) AS bucket_value
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT event_type,
                  unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
           FROM (SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
                 FROM bucketed GROUP BY event_type)),
         grid AS (
           SELECT s.event_type, s.bucket,
                  coalesce(b.n_events, 0) AS n_events, b.bucket_value
           FROM spine s LEFT JOIN bucketed b USING (event_type, bucket))
         SELECT event_type, bucket, n_events, bucket_value,
                last_value(bucket_value IGNORE NULLS) OVER
                  (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
         FROM grid""",

    // Same banded candidate graph as q24 (shared CTE chain), closed
    // transitively; Spark computes the identical components by min-label
    // propagation over the identical edge list.
    "q78_semantic_dedup" ->
      s"""WITH RECURSIVE ${ExtQueries.signLshPairsCtes},
         edge AS (SELECT vec_a AS a, vec_b AS b FROM pairs WHERE cosine >= 0.3
                  UNION ALL
                  SELECT vec_b AS a, vec_a AS b FROM pairs WHERE cosine >= 0.3),
         reach(src, dst) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT reach.src, edge.b FROM reach JOIN edge ON reach.dst = edge.a)
         SELECT src AS vec_id, CAST(min(dst) AS BIGINT) AS cluster_id,
                (src = CAST(min(dst) AS BIGINT)) AS keep
         FROM reach GROUP BY src""",

    // med/mad rounded to 4 BEFORE the gate; score multiplied as
    // abs·0.6745/mad in both engines (order matters for bit parity).
    "q79_mad_outliers" ->
      """WITH med AS (SELECT event_type, round(median(value), 4) AS med
                      FROM events GROUP BY 1),
         m2 AS (SELECT e.event_type, e.value, m.med
                FROM events e JOIN med m USING (event_type)),
         mad AS (SELECT event_type, round(median(abs(value - med)), 4) AS mad
                 FROM m2 GROUP BY 1)
         SELECT e.event_type, count(*) AS n_outliers,
                round(max(abs(e.value - e.med) * 0.6745 / d.mad), 4) AS max_robust_z
         FROM m2 e JOIN mad d USING (event_type)
         WHERE d.mad > 0 AND abs(e.value - e.med) * 0.6745 / d.mad > 3.5
         GROUP BY e.event_type""")
}
