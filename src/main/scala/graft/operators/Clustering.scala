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
}
