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
  * per-round shuffle is bounded by |E| + |V|. Plan depth is bounded by a
  * `localCheckpoint` every 4 rounds (same discipline as
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
    * vertex id of the component; isolated vertices map to themselves. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(MEMORY_AND_DISK)

    var labels = vertices.select(col("id"))
      .withColumn("label", col("id")).persist(MEMORY_AND_DISK)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)))
        .head().getDecimal(0)
    var curSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = e.join(labels, e("src") === labels("id"))
        .groupBy(col("dst").as("id")).agg(min("label").as("nmin"))
      val next0 = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      val next =
        if ((iter + 1) % 4 == 0) next0.localCheckpoint(true)
        else next0.persist(MEMORY_AND_DISK)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(curSum) == 0
      curSum = nextSum
      labels.unpersist()
      labels = next
      iter += 1
    }
    e.unpersist()
    labels.select(col("id"), col("label").as("component"))
  }
}
