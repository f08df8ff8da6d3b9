package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Near-duplicate detection for document corpora — the dedup family a
  * training-data pipeline needs beyond exact matching.
  *
  * Scale design (the point of each algorithm at 100 TB):
  *  - **exact**: hash-groupBy on a content fingerprint — one shuffle, map-side
  *    combine, no pairwise work.
  *  - **MinHash + LSH banding**: converts all-pairs similarity (O(n²), dead at
  *    any scale) into an equi-join on band keys: docs are only compared when
  *    they collide in a bucket. Shuffles: one to build signatures (explode
  *    shingles → groupBy doc), one self-join keyed by (band, key) whose
  *    fan-out is bucket-bounded. AQE handles hot buckets (boilerplate docs).
  *  - **SimHash**: one 60-bit signature per doc, near-dups = small Hamming
  *    distance; candidates come from 15-bit chunk collisions (pigeonhole: any
  *    pair at distance ≤3 shares at least one of 4 chunks — exact recall).
  *  - **n-gram Jaccard**: exact verification on candidate pairs through a
  *    shared-shingle join with a document-frequency cap on join shingles
  *    (standard frequent-shingle pruning; an ubiquitous shingle generates
  *    quadratic join fan-out and carries no signal).
  *
  * Every hash is the portable md5 family, so each operator's output is
  * bit-reproducible in the DuckDB oracle.
  */
object TextDedup {

  /** Generator-child wrapper: explode/posexplode over a bare ATTRIBUTE
    * triggers InferFiltersFromGenerate (`size(arr) > 0`), and predicate
    * pushdown re-inlines the attribute's whole producing chain into a
    * per-row Filter — tokenize evaluated twice per row on the simhash
    * path, the 16-md5 band array twice per signature on the LSH paths
    * (same landmine as [[TermWeighting]]'s explodeTerms; the q22 path is
    * protected by its persist barrier instead). `size(arr) >= 0` holds
    * for every non-null array and a null array explodes to nothing
    * either way; the `when` is a complex child the rule declines on. */
  private def noInfer(arr: Column): Column = when(size(arr) >= 0, arr)

  /** Exact dedup groups: canonical (min) doc id + duplicate count per
    * whitespace-normalized content fingerprint. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** (doc_id, sh) exploded distinct-shingle rows. Tokens are materialized in
    * their own projection before the shingle lambda touches them — without
    * the boundary the split() re-evaluates per element_at reference
    * (measured 10× slower at sf0.1). */
  private[operators] def shingleRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize+shingle+hash runs BEFORE any shuffle, so its parallelism is
    // the SCAN's: a small single-file corpus means one partition hashing on
    // one core. Rebalance only when the scan undersupplies the cluster — a
    // many-split 100 TB input takes the free path (no extra corpus shuffle).
    graft.plans.Tokenize.register(docs.sparkSession)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced = if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    balanced
      .select(col(idCol).as("doc_id"), tokensFast(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(shinglesFromTokens(col("__toks"))).as("sh"))
  }

  /** Fixed 29-bit odd mixing constant for hash function `j`, chunk `i` —
    * shared verbatim with the DuckDB oracle so signatures reproduce
    * bit-for-bit. Weyl-sequence-derived, deterministic. */
  private[graft] def mixConst(j: Int, i: Int): Long =
    (((j * 4 + i) * 0x9E3779B9L + 0x7F4A7C15L) & 0x1FFFFFFFL) | 1L

  /** MinHash signature frame: doc id + k minhash columns mh0..mh{k-1}
    * (BIGINT). One explode + one groupBy (single shuffle); all k mins
    * computed in the same aggregation pass.
    *
    * The k hash functions share ONE md5 per shingle, split into four
    * 28-bit chunks v0..v3; h_j = XORᵢ msb29(c_{j,i}·vᵢ) with per-j random
    * odd 29-bit constants, where msb29(p) = (p >> 14) & (2^29−1) — the
    * Dietzfelbinger multiply-shift family (middle product bits), XORed
    * across chunks. Every intermediate is < 2^57 — exact BIGINT
    * arithmetic in both engines, no overflow, no mod. Two designs that
    * look equivalent are NOT: h1+j·h2 double hashing shares one monotone
    * structure across j (measured: band collisions inflated ~7× and the
    * q50 component graph exploded), and summing raw products keeps h_j
    * monotone in the chunk magnitudes, so one small-chunk shingle is the
    * argmin for many j at once. Middle-bits + XOR keeps per-function
    * argmins decorrelated like independent hashes (candidate-pair counts
    * match the 12-independent-md5 baseline within ~8%). Replacing k
    * seeded md5s with one md5 + long arithmetic cut the signature stage
    * ~2× at sf0.1. */
  def minhashSignatures(docs: DataFrame, k: Int = 12,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol)
      .select(col("doc_id"), md5(col("sh")).as("__m"))
      .select(col("doc_id") +: (0 until 4).map(i =>
        conv(substring(col("__m"), 1 + 7 * i, 7), 16, 10).cast("long").as(s"__v$i")): _*)
    def hj(j: Int) =
      (0 until 4).map(i => shiftright(lit(mixConst(j, i)) * col(s"__v$i"), 14)
          .bitwiseAND(lit(536870911L)))
        .reduce(_ bitwiseXOR _)
    sh.groupBy(col("doc_id"))
      .agg(min(hj(0)).as("mh0"),
        (1 until k).map(j => min(hj(j)).as(s"mh$j")): _*)
  }

  /** (doc_id, band_id, band_key, bks) banded rows: one row per (doc, band)
    * carrying the doc's full band-key array `bks` so a pair join can detect
    * earlier-band collisions without a second pass. */
  private def bandedRows(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val keyCols = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => col(s"mh${b * rows + r}"))
      md5(concat_ws("|", parts: _*)).as(s"bk$b")
    }
    sig.select(col("doc_id") +: keyCols: _*)
      .select(col("doc_id"),
        array((0 until bands).map(b => col(s"bk$b")): _*).as("bks"))
      .select(col("doc_id"), col("bks"),
        posexplode(noInfer(col("bks"))).as(Seq("band_id", "band_key")))
  }

  /** Candidate near-dup pairs from MinHash LSH banding, with the estimated
    * Jaccard (fraction of agreeing minhashes). Output: (doc_a, doc_b,
    * est_jaccard), doc_a < doc_b.
    *
    * Shape (round-16, the q22 bucket-pair idiom): candidate pairs are
    * emitted IN PLACE from per-band-bucket member lists — ONE
    * groupBy(band_id, band_key) collects each bucket's (doc_id, signature,
    * band-key array) structs, ordered pairs come straight out of the
    * sorted bucket, and the carried signatures give est_jaccard in the
    * same projection. The previous formulation (persist the signature
    * frame, band self-join, then TWO signature join-backs for the
    * agreement count) paid three extra exchanges of the banded/pair
    * stream for the identical result; this one's only post-signature
    * exchange is the bucket groupBy. Each pair is still emitted EXACTLY
    * ONCE, at its first colliding band — the carried `bks` array filters
    * pairs that already collided in an earlier band, so a dense cluster
    * emits each pair once, not `bands` times, with no distinct shuffle.
    *
    * Scale note: a bucket's member list lives in one aggregation buffer
    * (~250 B per member), so a degenerate near-clique bucket costs memory
    * linear in cluster size — but the PAIR OUTPUT of such a bucket is
    * quadratic regardless of formulation, which is why the dense-cluster
    * scale path is [[minhashLshGroups]] (bucket-propagation components,
    * never pair volume). This operator is the pair-inspection regime. */
  def minhashLshPairs(docs: DataFrame, k: Int = 12, bands: Int = 4,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val rows = k / bands
    val sig = minhashSignatures(docs, k, idCol, textCol)
    val withArrays = sig.select(
      col("doc_id"),
      array((0 until k).map(j => col(s"mh$j")): _*).as("mhs"),
      array((0 until bands).map { b =>
        val parts = (0 until rows).map(r => col(s"mh${b * rows + r}"))
        md5(concat_ws("|", parts: _*))
      }: _*).as("bks"))
    val buckets = withArrays
      .select(col("doc_id"), col("mhs"), col("bks"),
        posexplode(noInfer(col("bks"))).as(Seq("band_id", "band_key")))
      .groupBy(col("band_id"), col("band_key"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("mhs"), col("bks")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    // pair emission via the fused PairCombinations kernel (round-19) — see
    // ngramJaccardPairs; same pairs in the same order, one allocation pass
    graft.plans.PairCombinations.register(docs.sparkSession)
    val pairs = buckets
      .select(col("band_id"),
        call_function("graft_pair_combinations", col("ids")).as("__ps"))
      .select(col("band_id"),
        explode(when(size(col("__ps")) >= 0, col("__ps"))).as("p"))
    // no earlier band j < band_id in which the pair also collides
    val firstCollision = not((0 until bands - 1).map { j =>
      col("band_id") > j && col("p.x.bks")(j) === col("p.y.bks")(j)
    }.reduce(_ || _))
    val agree = (0 until k).map(j =>
      when(col("p.x.mhs")(j) === col("p.y.mhs")(j), 1).otherwise(0)).reduce(_ + _)
    pairs.filter(firstCollision)
      .select(col("p.x.doc_id").as("doc_a"), col("p.y.doc_id").as("doc_b"),
        round(agree.cast("double") / k, 4).as("est_jaccard"))
  }

  /** LSH dedup GROUPS: connected components over the band-bucket collision
    * graph — the scale path for dense duplicate clusters, where enumerating
    * candidate pairs is inherently quadratic in cluster size (a 10k-copy
    * document is 50M pairs) but the component answer is linear.
    *
    * Implementation is min-label propagation over the bipartite doc↔bucket
    * graph (the DataFrame form of union-find's star-reduce): each round,
    * every bucket takes the min label of its member docs, every doc takes
    * the min label of its buckets; repeat until a fixpoint. Rounds needed =
    * graph diameter in bucket-hops (2-3 for duplicate clusters); each round
    * is two hash aggregations, never a pair join — candidate-pair volume
    * NEVER materializes.
    *
    * Output: (doc_id, cluster_id) for every input doc, cluster_id = min
    * doc_id of the component (singletons map to themselves). */
  def minhashLshGroups(docs: DataFrame, k: Int = 12, bands: Int = 4,
                       maxIter: Int = 20,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    require(k % bands == 0, "k must divide into equal bands")
    val sig = minhashSignatures(docs, k, idCol, textCol)
    // Pre-prune to the multi-member subgraph: a bucket with a single member
    // can never merge labels, and a doc whose buckets are ALL singletons is
    // its own component — it has no business inside the propagation loop.
    // One extra count-aggregation up front shrinks every round's join+agg
    // to the (typically small) colliding subset; at corpus scale the
    // active set is duplicates-only, orders of magnitude below membership.
    // Singletons rejoin at the end via one left join (label := doc_id).
    // The bucket-size gate is a COUNT WINDOW over the banded rows — one
    // shuffle, applied in place — not a count-aggregate joined back (that
    // shape needs a persist of the banded frame plus two more stages; at
    // local scale each extra action is a measurable slice of the floor).
    // localCheckpoint (not just persist): truncates the minhash lineage so
    // every loop round plans over a leaf, not the explode+groupBy subtree.
    val membership = bandedRows(sig, k, bands)
      .select(col("doc_id"),
        concat_ws("#", col("band_id"), col("band_key")).as("bucket"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bucket"))))
      .filter(col("__n") >= 2)
      .select("doc_id", "bucket").localCheckpoint(true)

    // Driver finisher (round-19, [[Graph.connectedComponents]]'s gate on
    // the bipartite membership sliver): the checkpointed multi-member
    // membership IS the whole loop input, and at duplicate-sliver sizes
    // the remaining propagation costs ~40 driver actions at the job floor
    // (measured: 44 jobs / 2.6 s for q50 at sf0.1, most of it the loop).
    // Bounded (≤ graft.graph.maxDriverMembership rows, default 2M — the
    // rows are (long, ~35-byte bucket string), so the collect is ≤ ~100
    // MB) → one collect + exact integer union-find over (bucket-first,
    // member) edges; min-label identity is integer-exact, so cluster_ids
    // are bit-identical to the fixpoint's. Above the cap the distributed
    // loop below runs unchanged; count() over the checkpointed leaf is
    // one cheap job either way.
    val sparkS = docs.sparkSession
    val idType = docs.schema(idCol).dataType
    val memCap = sparkS.conf.getOption("graft.graph.maxDriverMembership")
      .map(_.toLong).getOrElse(2000000L)
    // count and collect fused into ONE action (the Graph.scala take(cap+1)
    // idiom): an over-cap result is detected by length and falls through
    val memRows =
      if (graft.operators.Graph.isIntegral(idType) && memCap < Int.MaxValue.toLong)
        membership.select(col("bucket"), col("doc_id").cast("long"))
          .limit(memCap.toInt + 1).collect()
      else null
    if (memRows != null && memRows.length <= memCap) {
      val rows = memRows
      val first = new java.util.HashMap[String, java.lang.Long](rows.length * 2)
      val flatB = Array.newBuilder[Long]
      flatB.sizeHint(rows.length * 2)
      var i = 0
      while (i < rows.length) {
        val b = rows(i).getString(0); val d = rows(i).getLong(1)
        val f = first.putIfAbsent(b, d)
        if (f != null) { flatB += f.longValue(); flatB += d }
        i += 1
      }
      membership.unpersist()
      val (ids, labs) = graft.operators.Graph.minLabelComponents(flatB.result())
      import sparkS.implicits._
      val labelDf = sparkS.createDataset(
        ids.indices.map(j => (ids(j), labs(j))))
        .toDF("doc_id", "label")
        .select(col("doc_id").cast(idType).as("doc_id"),
          col("label").cast(idType).as("label"))
      return docs.select(col(idCol).as("doc_id"))
        .join(labelDf, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("cluster_id"))
    }

    var labels = membership.select("doc_id").distinct()
      .withColumn("label", col("doc_id")).persist(MEMORY_AND_DISK)
    // labels only ever DECREASE (min-propagation), so the fixpoint test is
    // "did the label sum change" — one aggregation per round instead of a
    // join + filter + action. Decimal sum: 1e12 docs × 1e12 ids overflows
    // a long, and a silent wrap here would terminate the loop early.
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))) // empty active set → 0, not null
        .head().getDecimal(0)
    def propagate(l: DataFrame): DataFrame = {
      val bucketMin = membership.join(l, "doc_id")
        .groupBy("bucket").agg(min("label").as("bmin"))
      val docMin = membership.join(bucketMin, "bucket")
        .groupBy("doc_id").agg(min("bmin").as("nmin"))
      l.join(docMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
    }
    // Sentinel start: the pre-pruned graph has only multi-member buckets,
    // so round 0 ALWAYS lowers some label — the first convergence check can
    // never pass, and the up-front labelSum action would be pure overhead.
    var curSum = java.math.BigDecimal.valueOf(-1L)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // TWO propagation rounds per materialization+convergence check:
      // labels are monotonically non-increasing, so an unchanged sum across
      // a pair ⟺ neither round changed anything ⟺ fixpoint. Halves the
      // driver-side action count (each action is the loop's stage-floor
      // unit) at the cost of at most one wasted round at the fixpoint.
      val next0 = propagate(propagate(labels))
      // persist truncates recomputation but not the LOGICAL plan: without a
      // checkpoint a 20-round propagation hands Catalyst a 40-join tree
      // (analysis/optimization time compounds per round). localCheckpoint
      // every 4th pair bounds plan depth (≤ ~24 joins) while the common
      // 2-pair convergence pays only cheap persists; eager=true
      // materializes before the previous round's cache is dropped below.
      val next =
        if ((iter + 2) % 8 == 0) next0.localCheckpoint(true)
        else next0.persist(MEMORY_AND_DISK)
      val nextSum = labelSum(next) // also materializes next's cache
      converged = nextSum.compareTo(curSum) == 0
      curSum = nextSum
      labels.unpersist()
      labels = next
      iter += 2
    }
    // Fold pruned singletons back in: every input doc gets a cluster_id,
    // docs outside the multi-member subgraph map to themselves.
    docs.select(col(idCol).as("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
  }

  /** 60-bit SimHash per doc: token-frequency-weighted bit votes over the
    * portable 60-bit hash. One explode + one groupBy; the 60 per-bit sums are
    * one aggregation pass. */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    graft.plans.SimHash60.register(docs.sparkSession)
    graft.plans.Tokenize.register(docs.sparkSession)
    // The signature is per-document, so it is ONE fused projection
    // ([[graft.plans.SimHash60]]): the previous explode + 60-conditional-sum
    // groupBy shuffled the whole token stream to compute a row-local value
    // (the repetitionStats round-15 argument; measured 2.8 s of q21's sf1
    // wall in the exchange+aggregate alone). Rebalance a single-file corpus
    // off one core first — the projection runs at the scan's parallelism.
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    balanced.select(col(idCol).as("doc_id"),
      call_function("graft_simhash60", tokensFast(col(textCol))).as("simhash"))
  }

  /** SimHash near-dup pairs at Hamming distance ≤ `maxHamming` (default 3),
    * candidates from 15-bit chunk collisions — exact recall for ≤3 by
    * pigeonhole over 4 chunks. Output: (doc_a, doc_b, hamming). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   maxPairsPerBucket: Long = SimhashMaxPairsPerBucket): DataFrame = {
    val sig = simhashSignatures(docs, idCol, textCol)
    val chunks0 = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk_id"),
          expr(s"shiftright(simhash, ${c * 15}) & 32767").as("chunk_val"))): _*)).as("ch"))
      .select(col("doc_id"), col("simhash"), col("ch.chunk_id"), col("ch.chunk_val"))
    // pair-volume guard (round-17): a hot chunk value — a dense cluster of
    // near-identical signatures — makes the self-join quadratic in the
    // bucket. Fail loudly instead of slowly; the window's exchange is the
    // join's own partitioning, so the guard adds no extra shuffle.
    val chunks = guardPairBuckets(chunks0, Seq("chunk_id", "chunk_val"),
      maxPairsPerBucket, "simhashPairs",
      "route the dense regime through minhashLshGroups / semantic grouping")
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      // filter BEFORE the distinct: hamming is a cheap bit_count already
      // in hand, and far-apart chunk-collision pairs (the vast majority)
      // would otherwise ride through the dedup shuffle just to be dropped
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Winnowed (rolling-window min-hash) fingerprints: (doc_id, fingerprint)
    * rows, ~2/(w+1) sampling of the positional shingle hashes. Joining on
    * `fingerprint` finds docs sharing any ≥(w+2)-token run — the
    * containment/plagiarism complement to MinHash's whole-doc similarity.
    * One projection chain + one explode; no shuffle until the caller
    * aggregates.
    *
    * Fingerprints are portable 60-bit [[hash60]] longs (round-15, the
    * q133/q51/q66 hash-gram move): every downstream consumer
    * (q37's dump, q44's df-capped pair buckets, q66's contamination join)
    * shuffles and aggregates 8-byte integers instead of hex strings, and
    * the window-min comparisons inside [[winnow]] are long compares. The
    * oracle applies the identical `md5 → first 15 hex → BIGINT` map, so
    * counts and min-selections agree exactly by construction. */
  def winnowFingerprints(docs: DataFrame, w: Int = 4,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.plans.WinnowHash60.register(docs.sparkSession)
    graft.plans.Tokenize.register(docs.sparkSession)
    // shingle+hash+winnow all run before any exchange — rebalance a
    // single-file corpus off one core (the shingleRows conditional idiom)
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par) else docs
    balanced
      .select(col(idCol).as("doc_id"), tokensFast(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        explode(call_function("graft_winnow_hash60",
          col("__toks"), lit(3), lit(w))).as("fingerprint"))
  }

  /** Derived df cap for [[ngramJaccardPairs]]: fan-out control is
    * RELATIVE to corpus size, so an absolute cap must grow with the
    * corpus — SCALE_r8.json measures the failure mode (10× replication
    * pushed every shared shingle past a fixed cap of 20 and pair recall
    * collapsed 186 → 0). Rule: ~`perMille` docs per thousand may share a
    * join shingle (default 4‰ ≈ 20 at the 5k-doc sf0.1 corpus, keeping
    * the declared q22 unchanged), floored at 20 so tiny corpora aren't
    * over-pruned. Callers pass the corpus doc count they already know;
    * the cap stays a plain parameter so the SQL oracle mirrors it. */
  def dfCapFor(corpusDocs: Long, perMille: Double = 4.0): Int =
    math.max(20L, math.round(corpusDocs * perMille / 1000.0)).toInt

  /** Default ceiling for the pair-regime operators' per-bucket candidate
    * volume: past ~200k pairs from ONE bucket the corpus is in the dense-
    * duplicate regime, where pair enumeration is the wrong tool (q78's
    * denseBucketCap argument) — the groups path (`minhashLshGroups`)
    * computes the same clusters without materializing pair volume.
    *
    * The ceiling scales with the VERIFIER's per-candidate cost: the
    * jaccard and edit-distance operators pay an intersection aggregate /
    * banded DP per candidate (200k/bucket is already seconds), while
    * simhash's verifier is one XOR+popcount, so its guard
    * ([[SimhashMaxPairsPerBucket]]) sits four orders of magnitude higher
    * — organic simhash chunk buckets concentrate (a 15-bit chunk shared
    * by 733 of sf1's 50k docs is normal structure, not a dup cluster),
    * and flagging those would make the guard cry wolf. */
  val DefaultMaxPairsPerBucket = 200000L

  /** Input-size gate for [[ngramJaccardPairs]]' eager pair-volume
    * preflight (round-19). Below this doc count a dense-bucket trip is
    * caught by the free in-plan assert at worst a couple of seconds into
    * the run, so no preflight is worth paying; above it a fail-slow trip
    * costs minutes (SCALE_r18: 160 s refusal on the 500k-doc spike — the
    * assert only fires when the dense bucket is REACHED, near the end of
    * the bucket stage), so the operator pays one extra count-only df
    * aggregate over the cached shingle frame up front and refuses before
    * any bucket is collected. 100k sits above every healthy benched
    * corpus (sf1 documents = 50k) and well below the spike regime. */
  val PairPreflightDocThreshold = 100000L

  /** [[simhashPairs]]' per-bucket candidate ceiling: ~1e9 popcount
    * comparisons ≈ a minute of one-bucket work — the point where chunk-
    * collision enumeration is genuinely the wrong regime (≥ ~45k docs in
    * ONE 15-bit bucket) rather than normal chunk concentration. */
  val SimhashMaxPairsPerBucket = 1000000000L

  /** LAZY per-bucket pair-volume guard (round-17, the q78 `denseBucketCap`
    * discipline applied to the pair-regime operators): asserts, inside the
    * plan, that no candidate bucket would emit more than
    * `maxPairsPerBucket` ordered pairs — a corpus in the dense-duplicate
    * regime fails LOUDLY with the escalation route in the message instead
    * of detonating into hours of output-bound pair emission (SCALE_r16's
    * df-spike row: 52× wall at 100×).
    *
    * The window partitions by the bucket key the downstream self-join
    * shuffles on anyway, so the guard introduces no additional exchange.
    * (Round-18 A/B note: an aggregate + join-back variant — bucket sizes
    * via map-side-combined groupBy, broadcast back — measured STRICTLY
    * worse at sf0.1 (q21 min 1.00 → 2.21 s, q47 0.50 → 0.66 s, same
    * window): recomputing the guarded frame for the aggregate branch costs
    * more than the window's sort, even with the signatures persisted. The
    * window form stays; operators whose guard input is a cheap projection
    * use the eager preflight in [[editDistancePairs]] instead.) */
  private def guardPairBuckets(df: DataFrame, bucketCols: Seq[String],
                               maxPairsPerBucket: Long, op: String,
                               escalation: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(bucketCols.map(col): _*)
    df.withColumn("__bn", count(lit(1)).over(w))
      .filter(coalesce(assert_true(
        col("__bn") * (col("__bn") - 1) / 2 <= maxPairsPerBucket,
        concat(lit(s"$op: a candidate bucket ("),
          concat_ws(",", bucketCols.map(col): _*),
          lit(s") of "), col("__bn"),
          lit(s" docs exceeds maxPairsPerBucket=$maxPairsPerBucket — " +
            s"dense-duplicate regime; $escalation, or raise the cap " +
            "deliberately"))), lit(true)))
      .drop("__bn")
  }

  /** Exact n-gram Jaccard over candidate pairs found via a shared-shingle
    * join. `maxShingleDf` prunes join shingles whose document frequency
    * exceeds the cap (fan-out control at scale — an ubiquitous shingle is
    * quadratic cost and no signal; derive the cap from corpus size with
    * [[dfCapFor]] — a FIXED cap prunes toward zero recall as the corpus
    * grows, measured in SCALE_r8.json). Output: (doc_a, doc_b, jaccard)
    * with jaccard ≥ `minJaccard`. */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double = 0.5,
                        maxShingleDf: Int = 20,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxPairsPerBucket: Long = DefaultMaxPairsPerBucket): DataFrame = {
    // pair-volume guard (round-18, advisor fix): checked against ACTUAL
    // bucket sizes in-plan, not the cap-derived worst case — a dfCapFor-
    // scaled cap on a large HEALTHY corpus (dfCapFor(500k)=2000 → 2M
    // worst-case pairs) must not hard-fail when no bucket is actually
    // dense; conversely a df-spike corpus whose buckets really sit at the
    // derived cap (SCALE_r16: 52× wall at 100×) still fails loudly. The
    // check is free: `size(ids)` is already materialized for the df
    // filter, so the assert below adds no exchange and no window.
    // Single pass over documents, exactly TWO shuffles:
    //  - the per-doc distinct-shingle count n_sh is size() of the shingle
    //    array BEFORE the explode (no groupBy(doc_id) shuffle at all), and
    //    it rides through the bucket shuffle inside the collected struct,
    //    so the final per-side size joins disappear too;
    //  - candidate pairs come from per-shingle doc buckets, NOT a
    //    self-join: groupBy(sh).collect_list buckets every shingle's
    //    (doc_id, n_sh) in one shuffle, the bucket-size filter IS the df
    //    filter (2 ≤ df ≤ cap — the cap also bounds each collected list,
    //    so memory per group is fixed), and ordered pairs are emitted in
    //    place from the sorted bucket. The earlier join formulation
    //    needed a persist+count of the full exploded shingle stream, a df
    //    aggregation, a join back, a two-arm self-join, and two size
    //    joins — for the identical n_inter (each pair is counted once per
    //    shared in-cap shingle either way). Measured 3.6s → ~2.2s at sf0.1.
    // Shingles ride as their portable 60-bit hash, not the string: the
    // shuffle moves 8-byte longs instead of ~25-byte strings and
    // hash-aggregates on fixed-width keys (measured ~15% off the query;
    // a cross-doc hash collision would need ~2^30 distinct shingles per
    // the birthday bound — and the oracle applies the identical hash, so
    // parity holds regardless). Tokens are materialized in their own
    // projection before the shingle lambda touches them (same boundary as
    // shingleRows — split() otherwise re-evaluates per element reference).
    //
    // The doc-level persist is an OPTIMIZER BARRIER first and a cache
    // second: explode makes InferFiltersFromGenerate add `size(__sh) > 0`
    // above an attribute generator, and predicate pushdown then inlines
    // the whole tokenize+shingle lambda chain into a per-row scan filter
    // (measured 19s vs 2.2s at sf0.1 — the query recomputed shingling
    // thrice per row). The cache boundary pins that filter to the
    // computed array column. The cached frame is one row per doc of
    // 8-byte hashes — strictly smaller than the text itself, and far
    // smaller than the exploded (doc_id, n, sh) stream the previous
    // formulation persisted.
    graft.plans.Hash60.register(docs.sparkSession)
    graft.plans.Tokenize.register(docs.sparkSession)
    // shingling+hashing parallelism is the scan's (the shingleRows lesson
    // — the cached frame's partitioning throttles every consumer too)
    val parJ = docs.sparkSession.sparkContext.defaultParallelism
    val balancedJ =
      if (docs.rdd.getNumPartitions < parJ) docs.repartition(parJ) else docs
    val docSh = balancedJ
      .select(col(idCol).as("doc_id"), tokensFast(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        transform(shinglesFromTokens(col("__toks")), s => hash60Fast(s)).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = docSh
      .select(col("doc_id"), size(col("__sh")).as("n"),
        explode(col("__sh")).as("sh"))
    // size-gated eager preflight (round-19): on a large input a dense-
    // bucket trip must not cost a full pipeline pass before refusing.
    // The preflight is the SAME per-bucket condition as the in-plan
    // assert below, evaluated from a count-only df aggregate — no
    // collect_list, no sort, no pair emission — so the 500k-doc spike
    // refuses after the linear shingle pass instead of near the end of
    // the bucket stage (SCALE_r18: 160 s; the count-path refusal is
    // bounded by the tokenize+hash scan it cannot avoid). Small inputs
    // skip it: the count(*) gate itself is a metadata-cheap aggregate,
    // and below the threshold the in-plan assert already fails fast.
    // the gate count comes from the CACHED shingle frame, not a separate
    // docs scan (round-20): docSh is one row per doc, so its count IS the
    // doc count, and counting it eagerly materializes the cache the query
    // pays for anyway (the q103/q115 eager-materialization lesson) instead
    // of a second full parquet scan just for the gate (measured 0.29 s at
    // sf0.1). A tripped preflight still pays the tokenize+hash pass it
    // cannot avoid — unchanged from the r19 shape.
    if (docSh.count() > PairPreflightDocThreshold) {
      val viol =
        try sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf &&
            col("df") * (col("df") - 1) / 2 > maxPairsPerBucket)
          .select(col("df"))
          .limit(1).collect()
        catch { case e: Throwable => docSh.unpersist(); throw e }
      if (viol.nonEmpty) {
        docSh.unpersist()
        throw new IllegalArgumentException(
          s"ngramJaccardPairs: a shingle bucket of ${viol.head.getLong(0)} " +
            s"docs exceeds maxPairsPerBucket=$maxPairsPerBucket — " +
            "dense-duplicate regime; route it through minhashLshGroups, " +
            "or raise the cap deliberately")
      }
    }
    // in-plan assert (kept for the sub-threshold path and as a belt for
    // callers that bypass the preflight via transformed inputs). The
    // condition is ORDER-INDEPENDENT across the merged filter's
    // conjuncts (round-19, advisor fix): Spark gives no contract on
    // conjunct evaluation order after CombineFilters merges this with
    // the df filter above, so a bucket the df cap silently drops
    // (size > maxShingleDf) must pass the assert vacuously rather than
    // rely on the df conjunct evaluating first.
    val buckets = sh.groupBy(col("sh"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")).between(2, maxShingleDf))
      .filter(coalesce(assert_true(
        size(col("ids")) > maxShingleDf ||
          size(col("ids")).cast("long") * (size(col("ids")) - 1) / 2
            <= maxPairsPerBucket,
        concat(lit("ngramJaccardPairs: a shingle bucket of "),
          size(col("ids")),
          lit(s" docs exceeds maxPairsPerBucket=$maxPairsPerBucket — " +
            "dense-duplicate regime; route it through minhashLshGroups, " +
            "or raise the cap deliberately"))), lit(true)))
    // n is functionally dependent on doc_id, so grouping by (a, n_a, b,
    // n_b) is the same partition as (a, b) — the sizes come along free.
    // Pair emission is the fused [[graft.plans.PairCombinations]] kernel
    // (round-19): the flatten(transform(slice)) chain allocated a sliced
    // array per member plus a nested array-of-arrays before flatten copied
    // the pair set again; the kernel emits the flat pair array in one
    // pass. Same pairs in the same order (differential-pinned).
    graft.plans.PairCombinations.register(docs.sparkSession)
    buckets
      .select(call_function("graft_pair_combinations", col("ids")).as("__ps"))
      .select(explode(when(size(col("__ps")) >= 0, col("__ps"))).as("p"))
      .groupBy(col("p.x.doc_id").as("doc_a"), col("p.x.n").as("n_a"),
        col("p.y.doc_id").as("doc_b"), col("p.y.n").as("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .select(col("doc_a"), col("doc_b"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Fuzzy dedup by edit distance: a capped Levenshtein over
    * `prefixLen`-char prefixes for candidate pairs blocked on (`blockCol`,
    * length-bucket) — both join keys are EQUALITY conditions so the pair
    * space stays a hash join over small blocks and the quadratic DP runs
    * only on capped prefixes of a bounded candidate set. (An unblocked
    * same-block join is quadratic in block size — measured minutes at
    * sf0.1.)
    *
    * The DP is the native [[graft.plans.EditDistanceCapped]] kernel, not
    * the built-in `levenshtein`: it decodes each string ONCE to a
    * code-point array and runs a ±maxDistance banded DP with an
    * early-exit row-minimum check — exact for every kept pair, and ~20×
    * faster than the built-in's O(pos) UTF8 cell access (which made the
    * DP the whole query's cost). A length-delta lower bound skips the DP
    * outright when `abs(len_a − len_b) > maxDistance`.
    *
    * `lenCol` is the document length used for bucketing (bucket = len/10).
    * Output: (doc_a, doc_b, edit_distance ≤ maxDistance). */
  def editDistancePairs(docs: DataFrame, maxDistance: Int = 40, prefixLen: Int = 80,
                        idCol: String = "doc_id", textCol: String = "text",
                        blockCol: String = "source", lenCol: String = "n_chars",
                        maxPairsPerBucket: Long = DefaultMaxPairsPerBucket): DataFrame = {
    graft.plans.EditDistanceCapped.register(docs.sparkSession)
    // spread the DP: a small input (one parquet file = one partition)
    // would otherwise run every distance computation on a single core.
    // Round-robin (not keyed — immune to block skew) over projected
    // (id, block, bucket, prefix) rows only; when the build side is big
    // enough to force a sort-merge join its own key exchange subsumes this
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // pair-volume guard (round-18 form): a hot (block, length-bucket) makes
    // the blocked self-join quadratic — fail loudly with the escalation
    // route. Unlike simhash (whose guard input needs the full signature
    // computation), the blocking key here is a cheap two-column projection,
    // so the guard runs as an EAGER preflight aggregate: a column-pruned
    // scan of (blockCol, lenCol) with map-side combine, one count row per
    // block. The lazy plan stays the pure pre-guard join — the r17 window
    // count cost 0.23→0.52 s at sf0.1 because it dragged the full
    // (id, block, bucket, 80-char prefix) rows through a low-cardinality
    // exchange+sort the broadcast join never needed.
    val hot = docs
      .select(col(blockCol).as("__blk"),
        floor(col(lenCol) / 10).cast("int").as("len_bucket"))
      .groupBy("__blk", "len_bucket").agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") * (col("__bn") - 1) / 2 > maxPairsPerBucket)
      .limit(1).collect()
    require(hot.isEmpty, {
      val r = hot.head
      s"editDistancePairs: a candidate bucket (${r.get(0)},${r.get(1)}) of " +
        s"${r.getLong(2)} docs exceeds maxPairsPerBucket=$maxPairsPerBucket " +
        "— dense-duplicate regime; block on a finer key (add a " +
        "shingle/prefix band to blockCol), or raise the cap deliberately"
    })
    val d0 = docs.select(col(idCol).as("doc_id"), col(blockCol).as("__blk"),
      floor(col(lenCol) / 10).cast("int").as("len_bucket"),
      substring(col(textCol), 1, prefixLen).as("prefix"))
    // probe side only — a broadcast build side would pay the exchange for
    // nothing (plan-audited: the extra Exchange sat under BroadcastExchange)
    val d = d0.repartition(par)
    d.as("a").join(d0.as("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.len_bucket") === col("b.len_bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        call_function("graft_edit_distance",
          col("a.prefix"), col("b.prefix"), lit(maxDistance)).as("edit_distance"))
      .filter(col("edit_distance") >= 0)
  }

  // ------------------------------------------- persisted MinHash-LSH index

  /** (doc_id, mhs, band_id, band_key) rows — the persisted-index row shape:
    * each doc appears once per band, carrying its full k-minhash signature
    * so a probe can ESTIMATE Jaccard (fraction of agreeing minhashes)
    * without ever touching the indexed corpus' text again. */
  private def lshIndexRows(docs: DataFrame, k: Int, bands: Int,
                           idCol: String, textCol: String): DataFrame = {
    val rows = k / bands
    minhashSignatures(docs, k, idCol, textCol)
      .select(
        col("doc_id"),
        array((0 until k).map(j => col(s"mh$j")): _*).as("mhs"),
        array((0 until bands).map { b =>
          md5(concat_ws("|", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*))
        }: _*).as("__bks"))
      .select(col("doc_id"), col("mhs"),
        posexplode(noInfer(col("__bks"))).as(Seq("band_id", "band_key")))
  }

  /** Build a persisted MinHash-LSH text index at `indexDir` — the
    * operational shape of corpus dedup at 100 TB: each incoming crawl
    * batch is checked against petabytes of already-ingested documents
    * WITHOUT re-shingling them. The index holds only signatures and band
    * keys (~bands × (32 B key + k × 8 B) per doc — four orders of
    * magnitude below the text), and probing is a join on (band_id,
    * band_key) against it. The reference has no index at all (it re-reads
    * every entity set per run, reference etl/extract.py); this is the
    * [[graft.operators.Similarity.Ivf]]-style maintained-index pattern
    * applied to text. */
  def buildLshIndex(docs: DataFrame, indexDir: String, k: Int = 12, bands: Int = 4,
                    idCol: String = "doc_id", textCol: String = "text"): Unit =
    lshIndexRows(docs, k, bands, idCol, textCol)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(indexDir)

  /** Incremental maintenance: index a new batch into the existing index.
    * Costs exactly the batch's own shingling — the indexed corpus is not
    * read, let alone re-hashed. */
  def appendToLshIndex(docs: DataFrame, indexDir: String, k: Int = 12, bands: Int = 4,
                       idCol: String = "doc_id", textCol: String = "text"): Unit =
    lshIndexRows(docs, k, bands, idCol, textCol)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(indexDir)

  /** Probe a persisted index with an incoming batch: for every incoming doc
    * that band-collides with an indexed doc and whose estimated Jaccard
    * clears `minEstJaccard`, emit one row
    * `(doc_id, dup_of, best_est_jaccard)` — `dup_of` the smallest
    * qualifying indexed doc id (deterministic under any collision order),
    * `best_est_jaccard` the best estimate among qualifiers, rounded to 4
    * decimals for engine portability. Self-collisions (same id on both
    * sides) are ignored, so re-probing an already-appended batch is
    * idempotent rather than all-dups.
    *
    * A pair colliding in several bands appears once per band in the join;
    * the per-pair estimate is identical on every copy, and min/max
    * aggregation is duplicate-blind — no distinct shuffle needed. */
  def probeLshIndex(incoming: DataFrame, indexDir: String, k: Int = 12, bands: Int = 4,
                    minEstJaccard: Double = 0.5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val idx = incoming.sparkSession.read.parquet(indexDir)
    val est = aggregate(
      zip_with(col("p.mhs"), col("x.mhs"), (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), _ + _).cast("double") / k
    lshIndexRows(incoming, k, bands, idCol, textCol).as("p")
      .join(idx.as("x"),
        col("p.band_id") === col("x.band_id") &&
          col("p.band_key") === col("x.band_key") &&
          col("p.doc_id") =!= col("x.doc_id"))
      .select(col("p.doc_id").as("doc_id"), col("x.doc_id").as("cand"),
        est.as("__est"))
      .filter(col("__est") >= minEstJaccard)
      .groupBy(col("doc_id"))
      .agg(min(col("cand")).as("dup_of"),
        round(max(col("__est")), 4).as("best_est_jaccard"))
      .orderBy(col("doc_id"))
  }
}
