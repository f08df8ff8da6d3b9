package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{aggregate, lit, round => sqlRound, sqrt, transform => hof_transform, zip_with}

/** Vector math over `array<float|double>` columns, built entirely from
  * Spark's codegen'd higher-order functions — no UDFs, no serialization of
  * the array out of Tungsten format.
  *
  * Elements are cast to double *before* any multiply so results are exact
  * IEEE double sequences, reproducible across engines (the DuckDB oracle
  * computes the identical left-to-right fold). `aggregate` folds
  * left-to-right, so summation order is deterministic — important both for
  * oracle parity and for run-to-run reproducibility at scale.
  */
object VectorFunctions {

  /** Elementwise cast to double. */
  def toDoubleArray(a: Column): Column = hof_transform(a, _.cast("double"))

  /** Dot product: left fold over pairwise products. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity in double precision. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Unit-normalized copy (double elements); lets downstream dots skip the
    * per-pair norm. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    hof_transform(toDoubleArray(a), x => x / n)
  }

  /** Cosine rounded for stable cross-engine comparison. */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    sqlRound(cosineSimilarity(a, b), scale)

  /** Native fused-loop cosine ([[graft.plans.CosineSimilarity]]); requires
    * `CosineSimilarity.register(spark)` on the session first. Bit-identical
    * to [[cosineSimilarity]] (same accumulation order), one pass, no
    * intermediate arrays. Length-mismatched inputs yield null in both
    * formulations (`zip_with` null-padding poisons the HOF fold; the native
    * expression checks lengths explicitly).
    *
    * Columns are passed RAW (round-20): the kernel reads `array<float>`
    * elements with the exact `(double)` widening itself, so no
    * per-row/per-pair `transform`-cast array is allocated. Inputs must be
    * `array<float|double>` (everything this engine scores is). */
  def cosineSimilarityNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine_sim", a, b)
}
