package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classification evaluation inside the engine — the measurement
  * half of the curation loop ([[QualityClassifier]] / heuristic gates
  * produce scores; this grades them against a reference label without
  * collecting anything to the driver).
  *
  * AUC is the tie-aware Mann–Whitney rank-sum: rank every row by score
  * once (ONE global sort — the only exchange; ties get their average
  * rank via a per-score-value count), then
  * `AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺ n⁻)`. Threshold metrics
  * (precision/recall/F1) are exact integer counts divided once. Every
  * arithmetic step is integer-exact until a single final division, so a
  * SQL oracle reproduces the numbers bit for bit.
  *
  * Scale note: rank() needs a total order over all scored rows — at
  * 100 TB that's a range-partitioned sort, the same cost class as any
  * global ORDER BY. For monitoring at that scale, evaluate on a
  * [[Sampling.hashSample]] of the corpus (deterministic, so the metric is
  * reproducible run to run).
  */
object Evaluation {

  /** One-row frame: `(n_pos, n_neg, auc, precision, recall, f1)` for
    * `scoreCol` ranked against boolean/0-1 `labelExpr`, thresholded at
    * `threshold` (predicted positive when `score >= threshold`).
    * Degenerate slices (single-class labels, no predicted positives)
    * yield null for the undefined metrics rather than failing. */
  def binaryMetrics(scored: DataFrame, scoreCol: Column, labelExpr: Column,
                    threshold: Double): DataFrame = {
    val base = scored.select(scoreCol.as("__s"),
      labelExpr.cast("int").as("__y"))
    val ranked = base
      .withColumn("__rk", rank().over(Window.orderBy(col("__s"))))
      .withColumn("__tc", count(lit(1)).over(Window.partitionBy(col("__s"))))
      .withColumn("__avgrk",
        col("__rk") + (col("__tc") - lit(1)) / lit(2.0))
    val pos = col("__y") === 1
    val pred = col("__s") >= threshold
    val agg = ranked.agg(
      sum(when(pos, 1L).otherwise(0L)).as("n_pos"),
      sum(when(!pos, 1L).otherwise(0L)).as("n_neg"),
      sum(when(pos, col("__avgrk"))).as("__possum"),
      sum(when(pred && pos, 1L).otherwise(0L)).as("__tp"),
      sum(when(pred && !pos, 1L).otherwise(0L)).as("__fp"),
      sum(when(!pred && pos, 1L).otherwise(0L)).as("__fn"))
    val tp = col("__tp"); val fp = col("__fp"); val fn = col("__fn")
    val nPos = col("n_pos"); val nNeg = col("n_neg")
    // guards make degenerate metrics NULL in BOTH engines (a bare double
    // division by zero would give NaN here but engine-dependent results
    // elsewhere)
    agg.select(
      nPos, nNeg,
      when(nPos > 0 && nNeg > 0,
        round((col("__possum") - nPos * (nPos + lit(1)) / lit(2.0)) /
          (nPos * nNeg).cast("double"), 4)).as("auc"),
      when(tp + fp > 0, round(tp.cast("double") / (tp + fp), 4)).as("precision"),
      when(tp + fn > 0, round(tp.cast("double") / (tp + fn), 4)).as("recall"),
      when(lit(2.0) * tp + fp + fn > 0,
        round(lit(2.0) * tp / (lit(2.0) * tp + fp + fn), 4)).as("f1"))
  }
}
