package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding compression analytics — the "can we ship int8 vectors"
  * decision a training/retrieval pipeline makes before storing billions
  * of embeddings.
  *
  * Reference scope: the reference pipeline has no vector path at all;
  * this extends the engine's embedding family (q23-q25, q36, q78, q98,
  * q125) with the storage-side counterpart of PQ: per-dimension scalar
  * quantization and its reconstruction-error report.
  */
object VectorCompress {

  /** Per-vector reconstruction error of symmetric per-dimension scalar
    * quantization (the int8/uint8 storage codec): each dimension `i` is
    * affinely mapped from its corpus-wide `[lo_i, hi_i]` range onto
    * `{0..levels}`, rounded to the nearest code, and mapped back; the
    * report is `(vec_id, mse, max_abs_err)` of `x − dequant(quant(x))`.
    *
    * Determinism / oracle parity: the code is `floor(t + 0.5)` (never
    * `round`, whose half-tie semantics differ between engines), every
    * operand is evaluated in double with the same association order as
    * the SQL twin, and the error fold runs left-to-right over dimensions.
    * A degenerate dimension (`hi == lo`) reconstructs exactly as `lo` on
    * both sides.
    *
    * Scale shape: pass 1 is a dimension-bounded aggregate (≤ `dim` groups
    * after map-side combine — the exchange carries per-task partials);
    * the collected stats are `dim` rows regardless of corpus size and
    * ship back embedded as literals, so pass 2 is a single codegen'd
    * projection over the scan: no join, no shuffle, no per-row state.
    * The error array is projected into its own column before the two
    * consuming folds (sum of squares, max of abs) — Spark does not CSE
    * inside higher-order-function lambdas, and an inlined alias would
    * re-quantize the vector once per consumer. */
  def scalarQuantizeError(embeddings: DataFrame, levels: Int = 255,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val stats = embeddings
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
      .orderBy("i")
      .collect() // dim rows — bounded by vector width, not corpus size
    val lo = typedLit(stats.map(_.getDouble(1)).toSeq)
    val hi = typedLit(stats.map(_.getDouble(2)).toSeq)
    val L = lit(levels.toDouble)

    val errs = transform(col(vecCol), (x0, i) => {
      val x = x0.cast("double")
      val l = element_at(lo, i + 1)
      val h = element_at(hi, i + 1)
      val q = least(L, greatest(lit(0.0), floor((x - l) * L / (h - l) + lit(0.5))))
      val xr = when(h === l, l).otherwise(l + q * (h - l) / L)
      x - xr
    })

    embeddings
      .select(col(idCol).as("vec_id"), errs.as("__e"))
      .select(col("vec_id"),
        round(aggregate(col("__e"), lit(0.0), (a, d) => a + d * d) /
          size(col("__e")), 6).as("mse"),
        round(array_max(transform(col("__e"), d => abs(d))), 6)
          .as("max_abs_err"))
  }
}
