package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Edge-list connected components by min-label propagation — the generic
  * form of the doc↔bucket propagation inside
  * [[TextDedup.minhashLshGroups]], for callers that already hold an
  * explicit pair/edge list (similarity graphs, entity-resolution match
  * graphs) rather than an LSH bucket membership.
  *
  * Each round every vertex takes the min label across its neighbors; the
  * loop stops at a fixpoint. Rounds needed = graph diameter (2-4 for
  * duplicate clusters, which are near-cliques); each round is one join +
  * one hash aggregation on the EDGE list — candidate-pair volume is the
  * edge count the caller already materialized, never squared.
  *
  * Scale notes (100 TB): labels and edges are (long, long) rows; the
  * per-round shuffle is bounded by |E| + |V|. Rounds run in PAIRS — two
  * propagations per materializing action — so the driver-side job count
  * (the stage-floor unit at local scale) is halved; plan depth is bounded
  * by a `localCheckpoint` every 4 actions = 8 rounds (same discipline as
  * [[TextDedup.minhashLshGroups]] — persist alone leaves Catalyst a
  * 2-joins-per-round logical tree and analysis time compounds). The
  * fixpoint test is a decimal label-sum (labels only decrease; a long sum
  * overflows at 1e12 ids × 1e12 labels and a silent wrap would terminate
  * the loop early).
  */
object Graph {

  /** Components of the undirected graph over `vertices` (column `id`) with
    * `edges` (columns `src`, `dst`; direction ignored, self-loops and
    * duplicates harmless). Output: `(id, component)`, component = min
    * vertex id of the component; isolated vertices map to themselves.
    *
    * PRECONDITION: edge endpoints ⊆ `vertices.id`. Labels are seeded from
    * edge endpoints (so the loop runs on the edge-touched sliver, not the
    * corpus), which means an endpoint absent from `vertices` still
    * propagates connectivity — two components could silently merge
    * through a phantom id, or a component could be labeled by an id that
    * is not a vertex. Derived graphs (q78's sign-LSH self-join over the
    * corpus) satisfy this by construction; for an UNTRUSTED edge list
    * pass `validateEdges = true` to fail loudly instead (one anti-join
    * count against `vertices` before the loop — |E| shuffle, off by
    * default so trusted callers don't pay it per run). */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20,
                          validateEdges: Boolean = false): DataFrame = {
    if (validateEdges) {
      val bad = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
        .join(vertices.select(col("id")), Seq("id"), "left_anti").count()
      require(bad == 0L,
        s"connectedComponents: $bad edge endpoint(s) missing from " +
          "`vertices` — components would merge through phantom ids; add " +
          "the vertices or clean the edge list")
    }
    // localCheckpoint (not just persist): the caller's edge list may be an
    // arbitrarily expensive subtree (q78 passes a sign-LSH cosine
    // self-join). persist caches EXECUTION but not the LOGICAL plan, and
    // the loop below embeds the edge plan in every round — each propagate
    // references its input twice, so plan size grows 4× per materialized
    // pair and the analyzer re-walks every embedded copy of the edge
    // subtree: measured 5s → 170s/run at sf0.1 on q78. Truncating to a
    // leaf here keeps every round's analyzed plan O(rounds), the same
    // discipline as minhashLshGroups' membership leaf.
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)

    // Pre-prune to edge-touched vertices (same discipline as
    // minhashLshGroups): an isolated vertex is its own component and has
    // no business inside the loop — in a near-dup graph the touched set
    // is duplicates-only, a sliver of the corpus. `e` carries both
    // directions, so src alone covers every endpoint. Isolated vertices
    // rejoin via one left join at the end.
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist(MEMORY_AND_DISK)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)))
        .head().getDecimal(0)
    def propagate(l: DataFrame): DataFrame = {
      val neighborMin = e.join(l, e("src") === l("id"))
        .groupBy(col("dst").as("id")).agg(min("label").as("nmin"))
      l.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
    }
    // The initial labelSum is NOT just the convergence seed — it is the
    // eager materialization of BOTH caches (labels, and e beneath it)
    // before the loop's multi-reference plans run. Without it the first
    // paired-round job references the unpopulated e cache from several
    // concurrent stages, each racing to recompute the (possibly very
    // expensive — q78 passes a cosine self-join) edge subtree: measured
    // 5s → 330s at sf0.1. Labels are monotone, so an unchanged sum across
    // a PAIR of rounds still ⟺ fixpoint — two propagations per
    // materializing action halves the loop's driver-side job count (the
    // stage-floor unit); the inner round's duplicate subtree dedupes via
    // exchange reuse against the populated caches.
    var curSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val next0 = propagate(propagate(labels))
      val next =
        if ((iter + 2) % 8 == 0) next0.localCheckpoint(true)
        else next0.persist(MEMORY_AND_DISK)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(curSum) == 0
      curSum = nextSum
      labels.unpersist()
      labels = next
      iter += 2
    }
    e.unpersist()
    vertices.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("label"), col("id")).as("component"))
  }

  /** Damped PageRank over a directed edge list — link-quality scoring for
    * web-crawl curation (seed-URL harvesting, spam down-ranking) where the
    * crawl graph is already an edge list next to the documents.
    *
    * Fixed `iterations` of the standard power method with dangling-mass
    * redistribution: `r' = (1-d)/N + d·(Σ_in r/outdeg + dangling/N)`.
    * Ranks sum to 1 every round (spec-asserted) — an invariant that
    * REQUIRES edges ⊆ V×V: an edge whose endpoint is missing from
    * `vertices` would silently drop its contribution in the join and
    * deflate total rank. A malformed crawl edge list is the norm, not the
    * exception, so endpoints are validated by default (one-time anti-join
    * before the loop; pass `validateEdges = false` for pre-cleaned
    * graphs). Per round: one join of
    * the edge list with current ranks + one hash aggregation — the same
    * |E|+|V| shuffle bound, plan depth bounded by `localCheckpoint` every
    * 4 rounds like [[connectedComponents]]. A fixed iteration count (not a
    * convergence epsilon) keeps the result deterministic for a given
    * graph, which is what a reproducible curation pipeline wants.
    *
    * No SQL oracle: recursive CTEs cannot re-aggregate per iteration
    * (PageRankSpec pins hand-computed ranks + the invariants instead).
    * Output: `(id, rank)`. */
  def pagerank(vertices: DataFrame, edges: DataFrame,
               iterations: Int = 10, damping: Double = 0.85,
               validateEdges: Boolean = true): DataFrame = {
    require(iterations > 0, "iterations must be positive")
    // Everything downstream (validation, outdegrees, the loop) consumes
    // the CACHED edge frame — the caller's `edges` may be an arbitrarily
    // expensive derivation (q92's is three joins over lineitem), and
    // referencing the parameter instead of `e` made that derivation run
    // once per consumer (measured ~2× the derivation cost at sf0.1).
    val e = edges.select(col("src"), col("dst")).persist(MEMORY_AND_DISK)
    if (validateEdges) {
      // this count also fills the e cache, so the derivation runs once
      val bad = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .join(vertices.select(col("id")), Seq("id"), "left_anti").count()
      require(bad == 0L,
        s"pagerank: $bad edge endpoint(s) missing from `vertices` — their " +
          "rank mass would silently vanish in the contribution join; add " +
          "the vertices or clean the edge list (validateEdges=false skips)")
    }
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    val v = vertices.select(col("id"))
      .join(outdeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .persist(MEMORY_AND_DISK)
    // ONE action for both pre-loop scalars (every driver action is ~0.2s
    // of floor at local scale): N for the teleport term, and the dangling
    // count — most curation graphs (and the q92 nation trade graph) have
    // no dangling vertices, and the per-round dangling-mass collect was
    // half the loop's driver actions. When the set is empty every round's
    // dangling term is exactly 0.0, and x + 0.0 == x in IEEE for the
    // strictly positive ranks, so skipping the term is bit-identical to
    // collecting an empty sum (the unrolled CTE oracle replays the same
    // ops either way). This action also fills the v cache.
    val vStats = v.agg(count(lit(1)).as("n"),
      sum(when(col("outdeg") === 0, 1L).otherwise(0L)).as("dangling")).head()
    val n = vStats.getLong(0).toDouble
    val hasDangling = vStats.getLong(1) > 0

    def step(r: DataFrame, dangling: Double): DataFrame = {
      val contrib = e.join(r, e("src") === r("id"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("in_mass"))
      v.join(contrib, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
    }

    var ranks = v.select(col("id"), col("outdeg"), lit(1.0 / n).as("rank"))
      .persist(MEMORY_AND_DISK)
    var iter = 0
    while (iter < iterations) {
      // With dangling vertices, each round needs the dangling scalar from
      // the PREVIOUS round's result — inherently one materializing action
      // per round. The scalar collect + literal is DELIBERATE (measured
      // at sf0.1): a broadcast single-row frame spawns an extra
      // broadcast-exchange stage per round (~+30%), and fusing whole
      // rounds into one lazy chain against not-yet-populated caches
      // recomputes parents (~1.5× slower). Without dangling vertices the
      // cross-round driver dependency disappears, so up to FOUR rounds
      // share one materializing action (extending connectedComponents'
      // pairing; safe here because e and v are eagerly populated before
      // the loop, so the fused chain's repeated references hit caches,
      // and 4 aligns with the localCheckpoint cadence bounding plan
      // depth) — inner rounds' duplicate subtrees dedupe via exchange
      // reuse.
      val take = if (hasDangling) 1 else math.min(4, iterations - iter)
      val next0 =
        if (hasDangling) {
          val dangling = ranks.filter(col("outdeg") === 0)
            .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
          step(ranks, dangling)
        } else (1 to take).foldLeft(ranks)((r, _) => step(r, 0.0))
      val next =
        if ((iter + take) % 4 == 0) next0.localCheckpoint(true)
        else next0.persist(MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent cache
      ranks.unpersist()
      ranks = next
      iter += take
    }
    v.unpersist(); e.unpersist()
    ranks.select(col("id"), col("rank"))
  }
}
