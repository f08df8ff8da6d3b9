package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-classification evaluation inside the engine — the measurement
  * half of the curation loop ([[QualityClassifier]] / heuristic gates
  * produce scores; this grades them against a reference label without
  * collecting anything to the driver).
  *
  * AUC is the tie-aware Mann–Whitney rank-sum, computed WITHOUT ranking
  * rows: rows first collapse to one aggregate per DISTINCT SCORE VALUE
  * (a hash aggregation — fully distributed), then a cumulative-count
  * window over that per-score frame yields each score's average rank
  * (`rows_below + (cnt+1)/2`), and
  * `AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺ n⁻)`. Threshold metrics
  * (precision/recall/F1) are exact integer counts divided once. Every
  * arithmetic step is integer-exact (or an exact IEEE half) until a
  * single final division, so a SQL oracle reproduces the numbers bit
  * for bit.
  *
  * Scale note: the unpartitioned cumulative window runs in a SINGLE task
  * over the per-score aggregate — fine when the score domain is bounded
  * (quantized/calibrated scores, the common case), NOT when scores are
  * continuous and distinct per row. At corpus scale either quantize the
  * score (round to a fixed precision) or evaluate on a
  * [[Sampling.hashSample]] of the corpus (deterministic, so the metric
  * is reproducible run to run); the data-sized work — the per-score
  * aggregation and the threshold counts — is distributed either way.
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
    // distributed reduction first: one row per distinct score value
    val perScore = base.groupBy(col("__s")).agg(
      count(lit(1)).as("__cnt"),
      sum(when(col("__y") === 1, 1L).otherwise(0L)).as("__pos"),
      sum(when(col("__y") =!= 1, 1L).otherwise(0L)).as("__neg"))
    // single-task window ONLY over the per-score frame (see scale note):
    // avg rank of a tie group = rows strictly below + (cnt+1)/2
    val below = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore
      .withColumn("__below", coalesce(sum(col("__cnt")).over(below), lit(0L)))
      .withColumn("__avgrk",
        col("__below") + (col("__cnt") + lit(1)) / lit(2.0))
    val pred = col("__s") >= threshold
    val agg = ranked.agg(
      sum(col("__pos")).as("n_pos"),
      sum(col("__neg")).as("n_neg"),
      sum(col("__pos") * col("__avgrk")).as("__possum"),
      sum(when(pred, col("__pos")).otherwise(0L)).as("__tp"),
      sum(when(pred, col("__neg")).otherwise(0L)).as("__fp"),
      sum(when(!pred, col("__pos")).otherwise(0L)).as("__fn"))
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
