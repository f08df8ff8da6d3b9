package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EvaluationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("binaryMetrics: hand-computed AUC with ties, threshold metrics") {
    // scores: pos {0.9, 0.5}, neg {0.5, 0.1} — the 0.5 tie contributes
    // half a concordant pair: AUC = (1 + 1 + 0.5 + 0)/4 ... computed via
    // rank-sum: ranks asc = 0.1→1, 0.5→2 (tie, avg 2.5), 0.9→4
    // possum = 4 + 2.5 = 6.5 ; AUC = (6.5 - 3)/4 = 0.875
    val df = Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)).toDF("score", "y")
    val m = Evaluation.binaryMetrics(df, col("score"), col("y") === 1, 0.5).head()
    assert(m.getLong(0) === 2L && m.getLong(1) === 2L)
    assert(m.getDouble(2) === 0.875)
    // at 0.5: predicted pos = {0.9,0.5,0.5} → tp=2 fp=1 fn=0
    assert(m.getDouble(3) === 0.6667) // precision
    assert(m.getDouble(4) === 1.0)    // recall
    assert(m.getDouble(5) === 0.8)    // f1 = 2*2/(2*2+1+0)
  }

  test("binaryMetrics: degenerate slices give null, not NaN") {
    val onePos = Seq((0.9, 1), (0.2, 1)).toDF("score", "y")
    val m = Evaluation.binaryMetrics(onePos, col("score"), col("y") === 1, 0.95).head()
    assert(m.isNullAt(2)) // auc undefined without both classes
    assert(m.isNullAt(3)) // no predicted positives → precision undefined
    assert(m.getDouble(4) === 0.0) // recall defined: 0 of 2 found
  }
}
