package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{DataQuality, TermWeighting}

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
      DataQuality.zscoreOutlierSummary(t(s, dir, "events"), "event_type", "value")))

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
         GROUP BY e.event_type""")
}
