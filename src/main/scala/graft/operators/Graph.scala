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

  /** Size gates for the driver-side loop finishers (round-19 optimization):
    * past the point where the LOOP INPUT is known to be bounded — the
    * edge-touched sliver of a dedup graph, an aggregated trade graph — the
    * remaining fixpoint iteration costs one driver action per round at the
    * job-scheduling floor (~25-100 ms each at any scale; measured 44-78
    * jobs per query on the q50/q78 family, over half their wall). Below
    * the caps the loop runs on the driver over the SAME materialized rows
    * (exact integer union-find / the identical float recurrence), above
    * them the distributed propagation runs unchanged. The caps are
    * session-conf knobs, not constants, so a cluster deployment can size
    * them to its driver heap (a 4M-edge sliver is ~64 MB collected —
    * the bounded-collect class k-centroids / hot-key sets already occupy). */
  private[operators] def maxDriverEdges(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("graft.graph.maxDriverEdges").map(_.toLong).getOrElse(4000000L)

  /** Exact min-label connected components over a flat (a0,b0,a1,b1,...)
    * edge array: union-find with path halving, roots kept at the smallest
    * member index — ids are sorted ascending, so a root's id IS the
    * component min, bit-identical to the distributed min-label fixpoint. */
  private[operators] def minLabelComponents(flatEdges: Array[Long]): (Array[Long], Array[Long]) = {
    val ids = java.util.Arrays.copyOf(flatEdges, flatEdges.length)
    java.util.Arrays.sort(ids)
    var n = 0
    var i = 0
    while (i < ids.length) {
      if (n == 0 || ids(n - 1) != ids(i)) { ids(n) = ids(i); n += 1 }
      i += 1
    }
    val id = java.util.Arrays.copyOf(ids, n)
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    var e = 0
    while (e < flatEdges.length) {
      val a = find(java.util.Arrays.binarySearch(id, flatEdges(e)))
      val b = find(java.util.Arrays.binarySearch(id, flatEdges(e + 1)))
      // always attach the larger root below the smaller: the root index
      // stays the component's min index = min id (ids are ascending)
      if (a < b) parent(b) = a else if (b < a) parent(a) = b
      e += 2
    }
    val label = new Array[Long](n)
    var j = 0
    while (j < n) { label(j) = id(find(j)); j += 1 }
    (id, label)
  }

  private[operators] def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }

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
    val spark = edges.sparkSession
    val idType = vertices.schema("id").dataType
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint(true)
    // Driver finisher (round-19): the checkpointed edge sliver is the
    // whole loop input; when it is bounded (≤ graft.graph.maxDriverEdges,
    // default 4M ≈ 64 MB) and ids are integral, one collect + an exact
    // integer union-find replaces 2·diameter propagation rounds of
    // join+agg actions (each a driver job at the scheduling floor; the
    // convergence labelSum actions go too). Min-label identity is exact —
    // integer min, no float involved — so the output is bit-identical to
    // the fixpoint. Above the cap (or exotic id types) the distributed
    // loop below runs unchanged; count() over the checkpointed leaf is
    // one cheap job either way.
    // count and collect fused into ONE action: take(cap+1) over the
    // checkpointed leaf both decides the gate and delivers the rows (an
    // over-cap result is detected by length and falls through)
    val cap = maxDriverEdges(spark)
    val rows0 =
      if (isIntegral(idType) && cap < Int.MaxValue.toLong)
        e0.na.drop()
          .select(col("src").cast("long"), col("dst").cast("long"))
          .limit(cap.toInt + 1).collect()
      else null
    if (rows0 != null && rows0.length <= cap) {
      // null endpoints contribute nothing in the join-based loop (a null
      // never equi-joins); dropping them above preserves that semantics
      val rows = rows0
      val flat = new Array[Long](rows.length * 2)
      var i = 0
      while (i < rows.length) {
        flat(2 * i) = rows(i).getLong(0); flat(2 * i + 1) = rows(i).getLong(1)
        i += 1
      }
      e0.unpersist()
      val (ids, labs) = minLabelComponents(flat)
      import spark.implicits._
      val labelDf = spark.createDataset(
        ids.indices.map(j => (ids(j), labs(j))))
        .toDF("id", "label")
        .select(col("id").cast(idType).as("id"),
          col("label").cast(idType).as("label"))
      return vertices.select(col("id"))
        .join(labelDf, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("label"), col("id")).as("component"))
    }
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    e0.unpersist()

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
    def validateDistributed(): Unit = if (validateEdges) {
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
    // ops either way). This action also fills the v AND e caches (via the
    // outdeg subtree), so validation — which now runs after it, in
    // whichever path executes — reads cached rows.
    val vStats = v.agg(count(lit(1)).as("n"),
      sum(when(col("outdeg") === 0, 1L).otherwise(0L)).as("dangling")).head()
    val n = vStats.getLong(0).toDouble
    val hasDangling = vStats.getLong(1) > 0

    // Driver finisher (round-19, the connectedComponents gate applied to
    // the rank loop): pagerank's loop input is the AGGREGATED graph —
    // q92's is 25 nations — while each power-method round costs 1-2
    // driver actions at the job floor (46 jobs measured for 10 rounds at
    // sf0.1, most of a 2.6 s wall). When the vertex count (known from
    // vStats) and the cached edge list are bounded, the identical
    // recurrence runs on the driver: same per-round expression
    // (1-d)/n + d·(in_mass + dangling/n), same coalesce-to-0.0 for
    // in-degree-0 vertices, contributions summed in (dst, src) order.
    // Ranks are floats, so cross-path sums can differ in final ulps —
    // the same tolerance the DuckDB oracle already exercises (its SUM
    // order is neither Spark's nor ours); q92 rounds to 8 places and is
    // hash-checked at every SF. Above the caps the distributed loop runs
    // unchanged.
    val spark = vertices.sparkSession
    val maxDriverV = spark.conf.getOption("graft.pagerank.maxDriverVertices")
      .map(_.toLong).getOrElse(65536L)
    val idType = vertices.schema("id").dataType
    val capE = maxDriverEdges(spark)
    val er0 =
      if (isIntegral(idType) && vStats.getLong(0) <= maxDriverV &&
          capE < Int.MaxValue.toLong)
        // count and collect fused (the connectedComponents take(cap+1)
        // idiom); nulls are KEPT so validation semantics below match the
        // distributed anti-join (a null endpoint is a missing endpoint)
        e.limit(capE.toInt + 1).collect()
      else null
    if (er0 != null && er0.length <= capE &&
        !er0.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
      val vRows = v.select(col("id").cast("long"), col("outdeg")).collect()
      if (!vRows.exists(_.isNullAt(0))) {
        val vr = vRows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        val nV = vr.length
        val idArr = vr.map(_._1)
        val outdegArr = vr.map(_._2)
        def idx(v: Long): Int = java.util.Arrays.binarySearch(idArr, v)
        val er = er0.map { r =>
          val s = r.get(0); val d = r.get(1)
          (s.asInstanceOf[Number].longValue(), d.asInstanceOf[Number].longValue())
        }.sortBy(t => (t._2, t._1))
        if (validateEdges) {
          // in-memory twin of the distributed anti-join: every endpoint
          // occurrence must be a vertex id
          var bad = 0L
          er.foreach { case (s, d) =>
            if (idx(s) < 0) bad += 1
            if (idx(d) < 0) bad += 1
          }
          require(bad == 0L,
            s"pagerank: $bad edge endpoint(s) missing from `vertices` — " +
              "their rank mass would silently vanish in the contribution " +
              "join; add the vertices or clean the edge list " +
              "(validateEdges=false skips)")
        }
        var rank = Array.fill(nV)(1.0 / n)
        var it = 0
        while (it < iterations) {
          val dangling =
            if (!hasDangling) 0.0
            else {
              var s = 0.0; var j = 0
              while (j < nV) { if (outdegArr(j) == 0) s += rank(j); j += 1 }
              s
            }
          val inMass = new Array[Double](nV)
          var k = 0
          while (k < er.length) {
            val (src, dst) = er(k)
            val si = idx(src); val di = idx(dst)
            // a non-vertex endpoint contributes nothing — exactly the
            // contribution join's miss semantics (validateEdges=false only)
            if (si >= 0 && di >= 0)
              inMass(di) += rank(si) / outdegArr(si).toDouble
            k += 1
          }
          val next = new Array[Double](nV)
          var j = 0
          while (j < nV) {
            next(j) = (1.0 - damping) / n + damping * (inMass(j) + dangling / n)
            j += 1
          }
          rank = next
          it += 1
        }
        v.unpersist(); e.unpersist()
        import spark.implicits._
        return spark.createDataset(
          idArr.indices.map(j => (idArr(j), rank(j))))
          .toDF("id", "rank")
          .select(col("id").cast(idType).as("id"), col("rank"))
      }
    }
    validateDistributed()

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
