package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed cluster ASSIGNMENT with an exact cross-engine contract —
  * the oracle-checkable half of k-means (the Lloyd loop that production
  * uses lives in [[Similarity.Ivf]]: sample-fit driver-side, broadcast-
  * assign distributed). Training is float-order dependent and has no SQL
  * twin,
  * but a single assignment round against FIXED centroids is pure
  * deterministic arithmetic — which makes it the one place the whole
  * codegen fast path ([[graft.plans.NearestCentroid]], the kernel every
  * IVF build and probe rides) can be proven cell-exact against a second
  * engine rather than only spec-tested against itself.
  *
  * Scale shape: centroids are a driver-side collect of exactly `k` rows
  * (bounded by construction — the caller names the ids), shipped into
  * WholeStageCodegen as a plan-time matrix; the assignment pass is one
  * fused loop per row with NO shuffle, NO join — the same
  * broadcast-assign shape as IVF, so the measured cost is the scan. A
  * full Lloyd iteration on top is one further `groupBy(cluster)` mean —
  * a vocabulary-of-k-sized aggregate — per round.
  */
object Clustering {

  /** Assign every vector to its nearest of the `centroidIds` vectors (by
    * squared L2, first-wins = smallest centroid index on exact ties —
    * [[graft.plans.NearestCentroid]] semantics, mirrored in the oracle by
    * `ORDER BY dist2, cid`). Centroid index `cluster` is the 0-based rank
    * of the centroid's id in ascending order.
    *
    * Output: `(vec_id, cluster, dist2)` per input vector, `dist2` the
    * squared distance to the chosen centroid rounded to 4 (computed as a
    * left-to-right `aggregate ∘ zip_with` fold — index order, the same
    * order as the codegen kernel's loop and DuckDB's `list_sum` over a
    * comprehension, so the rounded value is reproducible bit-for-bit). */
  def assignToCentroids(vecs: DataFrame, centroidIds: Seq[Long],
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(centroidIds.nonEmpty, "assignToCentroids needs >= 1 centroid id")
    val spark = vecs.sparkSession
    val centers: Array[Array[Double]] = vecs
      .filter(col(idCol).isin(centroidIds: _*))
      .orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(centers.length == centroidIds.length,
      s"found ${centers.length} of ${centroidIds.length} centroid ids")
    graft.plans.NearestCentroid.register(spark)
    val centersLit = typedLit(centers.map(_.toSeq).toSeq)
    // project the cast vector ONCE before any lambda consumes it (the
    // HOF-CSE landmine: Spark re-evaluates a non-attribute array child
    // per lambda element)
    vecs.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cluster",
        graft.plans.NearestCentroid.assign(col("__v"), centers).cast("long"))
      .withColumn("__c", element_at(centersLit, col("cluster").cast("int") + 1))
      .select(col("vec_id"), col("cluster"),
        round(aggregate(zip_with(col("__v"), col("__c"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _), 4).as("dist2"))
  }

  /** Distributed Lloyd refinement over the WHOLE corpus — the k-means a
    * data-mixing pipeline runs when it needs *converged* semantic domain
    * buckets, not IVF's rough sample-fit cells (at 100 TB a driver-side
    * sample can fit cells but cannot converge means over data it never
    * saw). Deterministic init: the `k` vectors with the smallest ids.
    *
    * Per round, two passes over the cached cast input:
    *  1. broadcast-assign ([[graft.plans.NearestCentroid]] codegen — no
    *     shuffle) + one `groupBy(cluster)` for counts and inertia
    *     (k-row aggregate);
    *  2. per-dimension mean via `posexplode` → `groupBy(cluster, dim)` —
    *     the shuffle carries only the MAP-SIDE PARTIAL sums: k·dim rows
    *     per input partition, never rows×dim. Both collects are k- or
    *     k·dim-sized (bounded by construction).
    *  An empty cluster keeps its previous center.
    *
    * Output: one row per round, `(round, inertia, max_shift)` — inertia
    * the summed squared distance to the assigned centers (rounded to 4),
    * `max_shift` the largest centroid L2 movement that round. Float sums
    * are partition-order dependent, so there is no SQL oracle (rows-only
    * by nature) — instead the query SELF-GATES on Lloyd's monotonicity
    * invariant: inertia must not increase round over round (beyond float
    * tolerance), which a broken assignment or mean update breaks
    * immediately. */
  def lloydRefine(vecs: DataFrame, k: Int, iters: Int,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, "lloydRefine needs k >= 1 and iters >= 1")
    val spark = vecs.sparkSession
    import spark.implicits._
    graft.plans.NearestCentroid.register(spark)
    val withV = vecs.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("__v")).persist()
    try {
      var centers: Array[Array[Double]] = withV.orderBy(col("vec_id"))
        .limit(k).select(col("__v")).collect()
        .map(_.getSeq[Double](0).toArray)
      require(centers.length == k, s"corpus has fewer than $k vectors")
      val dim = centers.head.length
      val rounds = Seq.newBuilder[(Int, Double, Double)]
      for (r <- 1 to iters) {
        val centersLit = typedLit(centers.map(_.toSeq).toSeq)
        val assigned = withV
          .withColumn("c", graft.plans.NearestCentroid.assign(col("__v"), centers))
          .withColumn("__ctr", element_at(centersLit, col("c") + 1))
          .withColumn("__d2", aggregate(zip_with(col("__v"), col("__ctr"),
            (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
        val stats = assigned.groupBy("c")
          .agg(count(lit(1)).as("n"), sum("__d2").as("in"))
          .collect().map(row => row.getInt(0) ->
            (row.getLong(1), row.getDouble(2))).toMap
        val sums = assigned
          .select(col("c"), posexplode(col("__v")).as(Seq("pos", "x")))
          .groupBy("c", "pos").agg(sum("x").as("sx"))
          .collect().map(row =>
            (row.getInt(0), row.getInt(1)) -> row.getDouble(2)).toMap
        val inertia = stats.values.map(_._2).sum
        val next = Array.tabulate(k) { c =>
          stats.get(c) match {
            case Some((n, _)) =>
              Array.tabulate(dim)(p => sums((c, p)) / n)
            case None => centers(c) // empty cluster keeps its center
          }
        }
        val maxShift = (0 until k).map { c =>
          math.sqrt((0 until dim)
            .map(p => { val d = next(c)(p) - centers(c)(p); d * d }).sum)
        }.max
        rounds += ((r, inertia, maxShift))
        centers = next
      }
      val out = rounds.result()
      // Lloyd's invariant — the self-gate that makes this rows-only query
      // fail loudly on a broken kernel/mean instead of shipping garbage
      out.sliding(2).foreach {
        case Seq((_, a, _), (rr, b, _)) =>
          require(b <= a * (1 + 1e-9) + 1e-9,
            f"lloydRefine: inertia INCREASED $a%.6f -> $b%.6f at round $rr " +
              "— assignment or mean update is broken")
        case _ => ()
      }
      out.map { case (r, i, s) =>
        (r, math.floor(i * 1e4 + 0.5) / 1e4, math.floor(s * 1e4 + 0.5) / 1e4)
      }.toDF("round", "inertia", "max_shift")
    } finally { withV.unpersist(); () }
  }

  /** Micro-unit scale for [[lloydAssignExact]]'s integer centroid state. */
  private val QuantScale = 1000000L

  /** EXACT distributed Lloyd — the oracle-checkable form of [[lloydRefine]]
    * (round-17: q118's move from rows-only to hash-green).
    *
    * [[lloydRefine]] keeps true floating-point means, whose cross-partition
    * sums are order-dependent — no SQL engine can replay them. Here the
    * CENTROID STATE is integer micro-units instead: each vector element is
    * quantized once (`floor(x·1e6)` as BIGINT — exact, deterministic), a
    * cluster's new center is the `floorDiv` of the exact integer sum by its
    * count, and the assignment distance is computed against `cq/1e6`
    * doubles — every arithmetic step is either exact integer math
    * (order-independent: sums of micro-units stay < 2^53 ≪ 2^63 at 1e6
    * units × billions of rows per cluster... at 8e3·1e6 here) or a
    * deterministic IEEE expression both engines evaluate identically (the
    * q117 pattern). The quantization changes the converged centers by
    * ≤ 1e-6 per element per round relative to true Lloyd — irrelevant for
    * domain bucketing, decisive for verifiability.
    *
    * Same per-round scale shape as [[lloydRefine]]: broadcast codegen
    * assignment (no shuffle) + one `groupBy(cluster, dim)` over the
    * posexploded quantized vector whose shuffle carries only map-side
    * partial sums (k·dim rows per input partition); driver state is k·dim
    * integers. Deterministic init: the `k` vectors with smallest ids.
    *
    * Output: the FINAL assignment, `(vec_id, cluster, dist2)` — dist2 the
    * squared distance to the converged center, rounded to 4, computed by
    * the same index-order fold as [[assignToCentroids]]. */
  def lloydAssignExact(vecs: DataFrame, k: Int, iters: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, "lloydAssignExact needs k >= 1 and iters >= 1")
    val spark = vecs.sparkSession
    graft.plans.NearestCentroid.register(spark)
    val withQ = vecs.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__q", transform(col("__v"),
        x => floor(x * lit(QuantScale.toDouble)).cast("long")))
      .persist()
    try {
      var cq: Array[Array[Long]] = withQ.orderBy(col("vec_id"))
        .limit(k).select(col("__q")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(cq.length == k, s"corpus has fewer than $k vectors")
      val dim = cq.head.length
      def centersOf(q: Array[Array[Long]]): Array[Array[Double]] =
        q.map(_.map(_.toDouble / QuantScale))
      for (_ <- 1 to iters) {
        val assigned = withQ.withColumn("c",
          graft.plans.NearestCentroid.assign(col("__v"), centersOf(cq)))
        val sums = assigned
          .select(col("c"), posexplode(col("__q")).as(Seq("pos", "x")))
          .groupBy("c", "pos")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"))
          .collect().map(r => (r.getInt(0), r.getInt(1)) ->
            (r.getLong(2), r.getLong(3))).toMap
        cq = Array.tabulate(k) { c =>
          if (sums.contains((c, 0)))
            Array.tabulate(dim) { p =>
              val (sx, n) = sums((c, p)); Math.floorDiv(sx, n)
            }
          else cq(c) // empty cluster keeps its center
        }
      }
      val centersLit = typedLit(centersOf(cq).map(_.toSeq).toSeq)
      withQ
        .withColumn("cluster",
          graft.plans.NearestCentroid.assign(col("__v"), centersOf(cq)).cast("long"))
        .withColumn("__c", element_at(centersLit, col("cluster").cast("int") + 1))
        .select(col("vec_id"), col("cluster"),
          round(aggregate(zip_with(col("__v"), col("__c"),
            (x, y) => (x - y) * (x - y)), lit(0.0), _ + _), 4).as("dist2"))
    } finally { withQ.unpersist(); () }
  }
}
