package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, deliberately:
  *  - **Brute force** (`bruteForceTopK`): exact; one broadcast of the query
  *    vector and a full scan with a codegen'd cosine — the right plan up to
  *    ~10⁸ vectors per query batch, and the correctness baseline for
  *    everything else.
  *  - **Sign-LSH buckets** (`SignLsh`): the scale path — `nBits` random
  *    hyperplanes (deterministically derived from the portable hash, no RNG
  *    state to ship) map each vector to a bucket id; candidate retrieval
  *    probes the query's bucket and its Hamming-≤1 neighbors, then re-scores
  *    exactly. The index is just a column — it survives as parquet, it
  *    partitions/buckets by `bucket`, and lookup is a partition-pruned scan
  *    instead of a full sweep. Same shape as an IVF index with hyperplane
  *    cells.
  */
object Similarity {

  /** Exact top-k by cosine against one query vector (given as a 1-row frame
    * with column `qv`). Tiebreak on id keeps the result total-ordered. */
  def bruteForceTopK(embeddings: DataFrame, query: DataFrame, k: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.crossJoin(broadcast(query))
      .withColumn("cos", cosineSimilarity(col(vecCol), col("qv")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("cos"), 6).as("cosine"))

  /** All pairs with cosine ≥ `threshold` (embedding near-dup dedup).
    * Pre-normalizes once so the pair score is a plain dot; pairs are blocked
    * by sign-LSH chunk collision exactly like MinHash banding, so this never
    * goes all-pairs at scale; `maxPairsPerBucket` caps pathological buckets. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         nBits: Int = 8,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = firstVectorLength(embeddings, vecCol)
    val normed = embeddings.select(col(idCol).as("vec_id"),
      l2Normalize(col(vecCol)).as("v"))
    // 2 bands of nBits/2 hyperplane signs each: near-identical vectors agree
    // on most signs, so they collide in at least one band with high prob.
    val sig = withSignBits(normed, "v", dim, nBits)
    val half = nBits / 2
    val banded = sig.select(col("vec_id"), col("v"),
      explode(array(
        struct(lit(0).as("band"), col("sig").bitwiseAND(lit((1 << half) - 1)).as("key")),
        struct(lit(1).as("band"), shiftright(col("sig"), half).as("key")))).as("b"))
      .select(col("vec_id"), col("v"), col("b.band"), col("b.key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dotProduct(col("a.v"), col("b.v")), 6).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * portable 60-bit hash scaled to [-1, 1). Same formula is expressible in
    * the oracle, and identical on every executor with no broadcast RNG. */
  private def planeComponent(plane: Int, d: Int): Column =
    hash60(lit(s"plane_${plane}_$d")).cast("double") / lit(math.pow(2, 59)) - 1.0

  /** Append `sig`: an int whose bit j is the sign of dot(v, plane_j). */
  private def withSignBits(df: DataFrame, vecCol: String, dim: Int, nBits: Int): DataFrame = {
    val sig = (0 until nBits).map { j =>
      val dot = (0 until dim).map(d =>
        element_at(col(vecCol), d + 1) * planeComponent(j, d)).reduce(_ + _)
      when(dot >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    df.withColumn("sig", sig)
  }

  private def firstVectorLength(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Sign-LSH index + exact re-scoring ANN. Build once, query many. */
  final case class SignLsh(nBits: Int, dim: Int) {

    /** Index frame: (vec_id, v normalized double, bucket). Persist / bucket
      * by `bucket` for partition-pruned probes at scale. */
    def index(embeddings: DataFrame, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame =
      withSignBits(
        embeddings.select(col(idCol).as("vec_id"), l2Normalize(col(vecCol)).as("v")),
        "v", dim, nBits)
        .withColumnRenamed("sig", "bucket")

    /** Top-k through the index: probe the query bucket and all buckets at
      * Hamming distance 1 (nBits+1 buckets), re-score exactly, take k. */
    def topK(indexDf: DataFrame, query: DataFrame, k: Int = 10): DataFrame = {
      val q = withSignBits(query.select(l2Normalize(col("qv")).as("qn")), "qn", dim, nBits)
        .withColumnRenamed("sig", "qbucket")
      val probes = q.select(col("qn"),
        explode(array((-1 until nBits).map {
          case -1 => col("qbucket")
          case j => col("qbucket").bitwiseXOR(lit(1 << j))
        }: _*)).as("bucket"))
      indexDf.join(broadcast(probes), "bucket")
        .withColumn("cos", dotProduct(col("v"), col("qn")))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(k)
        .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
    }
  }
}
