package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-13 declarations — more first-class training-data-pipeline
  * operators, full-oracle except where float order forbids it:
  *
  *  - q115 PMI collocations ([[graft.operators.TermWeighting.pmiCollocations]])
  *    — the phrase-mining / vocab-merge primitive.
  *  - q116 held-out OOV rate ([[graft.operators.TermWeighting.oovRate]])
  *    — tokenizer/vocab coverage of the q104 train split's vocabulary.
  *  - q117 k-means assignment ([[graft.operators.Clustering.assignToCentroids]])
  *    — proves the [[graft.plans.NearestCentroid]] codegen kernel (the
  *    IVF fast path) cell-exact against a second engine, not just
  *    against its own spec.
  *  - q118 distributed Lloyd — EXACT integer micro-unit form
  *    ([[graft.operators.Clustering.lloydAssignExact]], hash-green since
  *    round 17); the float-mean [[graft.operators.Clustering.lloydRefine]]
  *    stays spec-verified with its inertia-monotonicity self-gate.
  *  - q119 quality-canonical dedup ([[graft.operators.Dedup.keepBestByScore]])
  *    — q50 groups × q27 scores, oracle composes both CTE chains.
  *  - q120 inverted-index BM25 ([[graft.operators.InvertedIndex]]) —
  *    partition-pruned probes, shares q103's oracle.
  *  - q121/q122 BPE encode ([[graft.operators.BpeTrain.encode]]) — full
  *    12-rule encode (rows-only + round-trip gate + differential spec)
  *    and the oracle-checked 2-rule prefix (the q110/q111 split).
  */
object Ext6Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q117's fixed centroid set: the 8 smallest non-query vector ids
    * (vec_id 0 is the ANN family's designated query vector). */
  private val KmCentroidIds: Seq[Long] = 1L to 8L

  /** Rank-ordered merge rules, trained ONCE per (source, data
    * fingerprint) and persisted as a tiny parquet — the IndexStore
    * protocol the ANN indexes use: the cold pass trains (q110's own
    * measured cost), every later pass reads n rows. Training is
    * deterministic, so the cache is exact. */
  private def learnedMergesCached(s: SparkSession, dir: String,
                                  n: Int): Seq[(String, String)] = {
    val path = graft.operators.Similarity.IndexStore.pathFor(
      s, s"$dir/documents.parquet", s"bpe-merges-$n")
    if (!graft.operators.Similarity.IndexStore.isBuilt(s, path))
      graft.operators.BpeTrain.learnMerges(t(s, dir, "documents"), n)
        .coalesce(1).write.mode("overwrite").parquet(path)
    s.read.parquet(path).orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** Unrolled exact-Lloyd oracle (q118) — the pagerank unrolled-CTE
    * pattern applied to k-means. Per round r: assignment of every vector
    * to its nearest round-(r−1) center (distance = index-order double
    * fold against `cq/1e6`, ties to the smaller cid — exactly the
    * NearestCentroid kernel's contract, q117-proven), then per-(cluster,
    * dim) exact BIGINT sums of the micro-unit vectors and a floor-div
    * mean — `(sx - ((sx % n + n) % n)) / n` is floor division for either
    * sign, matching `Math.floorDiv`, and the double division is exact
    * (the numerator is an exact multiple ≤ 2^53). Empty clusters keep
    * their center via the COALESCE left join. */
  private def lloydExactOracle(k: Int, iters: Int): String = {
    def dist(cqRef: String) =
      s"""list_sum([(p[1] - CAST(p[2] AS DOUBLE)/1000000.0) *
         |              (p[1] - CAST(p[2] AS DOUBLE)/1000000.0)
         |              for p in list_zip(e.v, $cqRef)])""".stripMargin
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (
      |  SELECT vec_id,
      |         [CAST(x AS DOUBLE) for x in embedding] AS v,
      |         [CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
      |          for x in embedding] AS q
      |  FROM embeddings),
      |c0 AS (
      |  SELECT rn - 1 AS cid, q AS cq FROM (
      |    SELECT q, row_number() OVER (ORDER BY vec_id) AS rn FROM e)
      |  WHERE rn <= $k),
      |""".stripMargin
    for (r <- 1 to iters) {
      sb ++= s"""a$r AS (
        |  SELECT vec_id, q, cid AS c FROM (
        |    SELECT e.vec_id, e.q, c.cid,
        |           row_number() OVER (PARTITION BY e.vec_id
        |                              ORDER BY ${dist("c.cq")}, c.cid) AS rn
        |    FROM e, c${r - 1} c)
        |  WHERE rn = 1),
        |s$r AS (
        |  SELECT c AS cid, pos, sum(x) AS sx, count(*) AS n FROM (
        |    SELECT c, unnest(q) AS x, unnest(range(1, len(q) + 1)) AS pos
        |    FROM a$r)
        |  GROUP BY c, pos),
        |n$r AS (
        |  SELECT cid,
        |         list(CAST((sx - (((sx % n) + n) % n)) / n AS BIGINT)
        |              ORDER BY pos) AS cq
        |  FROM s$r GROUP BY cid),
        |c$r AS (
        |  SELECT p.cid, COALESCE(nn.cq, p.cq) AS cq
        |  FROM c${r - 1} p LEFT JOIN n$r nn ON p.cid = nn.cid),
        |""".stripMargin
    }
    sb ++= s"""fin AS (
      |  SELECT e.vec_id, c.cid, ${dist("c.cq")} AS d2
      |  FROM e, c$iters c)
      |SELECT vec_id, CAST(cid AS BIGINT) AS cluster, round(d2, 4) AS dist2
      |FROM (SELECT vec_id, cid, d2,
      |             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |      FROM fin)
      |WHERE rn = 1""".stripMargin
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Corpus-level phrase mining: top-50 bigram collocations by PMI with
    // a min-count floor. Exact integer counts; one float expression per
    // surviving pair.
    "q115_pmi_collocations" -> ((s, dir) =>
      graft.operators.TermWeighting.pmiCollocations(t(s, dir, "documents"))),

    // Vocab coverage: per-held-out-doc OOV token rate vs the train
    // split's vocabulary (same md5 split unit as q104).
    "q116_oov_rate" -> ((s, dir) =>
      graft.operators.TermWeighting.oovRate(t(s, dir, "documents"))),

    // One k-means assignment round against 8 fixed centroids — the
    // broadcast-assign codegen kernel, oracle-checked per cell.
    "q117_kmeans_assign" -> ((s, dir) =>
      graft.operators.Clustering.assignToCentroids(
        t(s, dir, "embeddings"), KmCentroidIds)),

    // Distributed Lloyd over the whole corpus, EXACT form: 5 refinement
    // rounds, k = 8, integer micro-unit centroid state (round-17 — the
    // move that gave this query a full DuckDB oracle: exact BIGINT sums
    // and floorDiv means are order-independent, and the assignment
    // arithmetic is the deterministic-IEEE q117 pattern, so DuckDB
    // replays all five rounds plus the final assignment cell-exact).
    // The float-mean lloydRefine stays the spec-verified operator for
    // callers that want true means; its inertia-monotonicity self-gate
    // is covered by ClusteringSpec.
    "q118_kmeans_lloyd" -> ((s, dir) =>
      graft.operators.Clustering.lloydAssignExact(
        t(s, dir, "embeddings"), k = 8, iters = 5)),

    // Persisted inverted-index BM25: build postings once (partitioned by
    // term bucket), probe with partition-pruned reads — must be
    // cell-identical to q103's full-scan answer (same scoring tail, same
    // oracle), the build-vs-probe parity bar the ANN indexes meet.
    "q120_bm25_indexed" -> ((s, dir) => {
      val path = graft.operators.Similarity.IndexStore.pathFor(
        s, s"$dir/documents.parquet", "bm25inv64")
      graft.operators.InvertedIndex.loadOrBuild(
        s, t(s, dir, "documents"), path)
      graft.operators.InvertedIndex.probeBm25(
        s, path, Ext5Queries.Bm25Terms, topK = 20)
    }),

    // BPE ENCODE under the full 12-rule vocabulary q110 trains — the
    // apply half of the tokenizer story (fertility stats per document).
    // Round-19: HASH-GREEN — DuckDB re-learns all 12 rules
    // (Ext5Queries.bpeTrainCtes(12), the q111 chain unrolled) and the
    // round-12 dict's symbol lengths ARE the encode (the same greedy
    // application the BpeEncodeLen kernel runs); the kernel's semantics
    // stay pinned by BpeTrainSpec's differential encoder.
    "q121_bpe_encode" -> ((s, dir) =>
      graft.operators.BpeTrain.encode(
        t(s, dir, "documents"), learnedMergesCached(s, dir, 12))),

    // The first-two-merges ENCODE, fully oracle-checked: DuckDB
    // re-learns m1/m2 (q111's CTE chain) and re-applies them to every
    // word via greedy left-to-right replacement.
    "q122_bpe_encode_2rules" -> ((s, dir) =>
      graft.operators.BpeTrain.encode(
        t(s, dir, "documents"), learnedMergesCached(s, dir, 2))),

    // Quality-canonical dedup: per q50 LSH group keep the member with
    // the highest q27 quality score (ties -> smallest doc_id) — the
    // curation composition production dedup actually applies.
    "q119_dedup_keep_best" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val docs = t(s, dir, "documents")
      graft.operators.Dedup.keepBestByScore(
        graft.operators.TextDedup.minhashLshGroups(docs,
          k = ExtQueries.K, bands = ExtQueries.BANDS),
        graft.operators.TextAnalysis.qualityScore(docs)
          .select(col("doc_id"), col("quality_score")))
    })
  )

  val oracles: Map[String, String] = Map(

    // q121 (round-19, rows-only -> HASH-GREEN): DuckDB re-learns the 12
    // merge rules from raw parquet and encodes every vocab word by the
    // same greedy application — the round-12 dict's len(syms) joined to
    // per-doc term frequencies is exactly BpeCodec.statsFromEncodedVocab.
    "q121_bpe_encode" -> Ext5Queries.bpeEncodeStatsSql(12),

    // Same tokenizer CTE as the q85/q105 LM family; PMI from exact
    // integer counts, rounded to 4, total order (pmi desc, w1, w2).
    "q115_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                     x -> x <> '') AS t
        |  FROM documents),
        |big AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 2),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
        |nb AS (SELECT CAST(sum(c2) AS BIGINT) AS nb FROM c2),
        |cw AS (SELECT w, count(*) AS cw
        |       FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
        |n AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM cw),
        |scored AS (
        |  SELECT w1, w2, c2,
        |         round(ln((CAST(c2 AS DOUBLE) / nb) /
        |                  ((CAST(l.cw AS DOUBLE) / n) *
        |                   (CAST(r.cw AS DOUBLE) / n))), 4) AS pmi
        |  FROM c2 JOIN cw l ON c2.w1 = l.w JOIN cw r ON c2.w2 = r.w, n, nb
        |  WHERE c2 >= 5)
        |SELECT w1, w2, CAST(c2 AS BIGINT) AS c2, pmi,
        |       CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT)
        |         AS rk
        |FROM scored
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,

    // Train split = q104's md5 hash unit < 0.8; vocabulary = distinct
    // train terms; OOV counts token INSTANCES on the held-out side.
    // Docs with zero tokens emit no row (no token rows to count).
    "q116_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |                     x -> x <> '') AS t,
        |         (('0x'||substr(md5('graft|'||doc_id), 1, 8))::BIGINT
        |          % 1000000) / 1000000.0 AS u
        |  FROM documents),
        |vocab AS (
        |  SELECT DISTINCT unnest(t) AS term FROM toks WHERE u < 0.8),
        |held AS (
        |  SELECT doc_id, unnest(t) AS term FROM toks WHERE u >= 0.8)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_oov,
        |       round(CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / count(*), 4) AS oov_rate
        |FROM held h LEFT JOIN vocab v USING (term)
        |GROUP BY doc_id""".stripMargin,

    // Distance fold mirrors the codegen kernel: index-order sum of
    // squared per-dim differences in double (q23's proven list_sum /
    // list_zip parity pattern); ties (impossible on this data, total
    // order regardless) break to the smaller centroid index like the
    // kernel's strict `<` first-wins.

    // q118: all five Lloyd rounds REPLAYED — exact integer micro-unit
    // sums and floor-div means are engine-independent, and each round's
    // assignment is the q117 deterministic-IEEE pattern against cq/1e6
    // centers (the pagerank unrolled-CTE approach applied to k-means).
    "q118_kmeans_lloyd" -> lloydExactOracle(8, 5),

    // q120: the indexed probe must reproduce the full-scan q103 answer
    // cell for cell — SAME oracle SQL, by reference.
    "q120_bm25_indexed" -> Ext5Queries.oracles("q103_bm25_rank"),

    // q119: the q50 group CTE chain composed with q27's quality formula;
    // kept member = row_number 1 by (quality desc, doc_id) per group.
    "q119_dedup_keep_best" ->
      s"""WITH RECURSIVE ${ExtQueries.lshGroupsCtes},
         |q AS (${ExtQueries.qualityOracle}),
         |m AS (
         |  SELECT g.cluster_id, g.doc_id, q.quality_score,
         |         count(*) OVER (PARTITION BY g.cluster_id) AS n_docs,
         |         row_number() OVER (PARTITION BY g.cluster_id
         |                            ORDER BY q.quality_score DESC, g.doc_id)
         |           AS rn
         |  FROM groups g JOIN q USING (doc_id))
         |SELECT cluster_id, CAST(n_docs AS BIGINT) AS n_docs,
         |       doc_id AS kept_id, quality_score AS kept_score
         |FROM m WHERE rn = 1""".stripMargin,

    "q117_kmeans_assign" ->
      """WITH c AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
        |         embedding AS cv
        |  FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |d AS (
        |  SELECT e.vec_id, c.cid,
        |         list_sum([(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
        |                   (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
        |                   for p in list_zip(e.embedding, c.cv)]) AS dist2
        |  FROM embeddings e, c)
        |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
        |       round(dist2, 4) AS dist2
        |FROM (SELECT vec_id, cid AS cluster, dist2,
        |             row_number() OVER (PARTITION BY vec_id
        |                                ORDER BY dist2, cid) AS rn
        |      FROM d)
        |WHERE rn = 1""".stripMargin
  )
}
