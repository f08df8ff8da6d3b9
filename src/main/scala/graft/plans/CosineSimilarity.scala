package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<double>` columns.
  *
  * The higher-order-function formulation ([[graft.functions.VectorFunctions
  * .cosineSimilarity]]) materializes three intermediate arrays per row
  * (zip_with product + two squared copies) and folds each; this expression
  * is a single fused loop — no intermediate ArrayData allocation, one pass
  * over both vectors — generated directly into the enclosing
  * WholeStageCodegen stage.
  *
  * Accumulation order (ascending index, separate accumulators, final
  * `dot/(sqrt(na)*sqrt(nb))`) is EXACTLY the higher-order version's fold
  * order, so results are bit-identical and the DuckDB oracle parity carries
  * over unchanged.
  *
  * Result-identical to the HOF version on ALL inputs, including malformed
  * ones: null array inputs return null (standard null-safe contract);
  * length-mismatched arrays return null (zip_with null-padding poisons the
  * HOF fold); a null ELEMENT in either array returns null (a null product
  * poisons the HOF fold). This total equivalence is what lets
  * [[RewriteHofCosine]] substitute this expression unconditionally.
  *
  * Either side may be `array<float>` (round-20): elements are widened to
  * double AT READ (`(double) getFloat(i)`, an exact IEEE widening — the
  * identical value sequence `transform(a, cast double)` produces), so the
  * caller-side `transform` cast that used to allocate a fresh double array
  * PER JOIN PAIR in the cross-scoring operators (q124/q128: |corpus|×|Q|
  * allocations) disappears while every accumulated double stays
  * bit-identical.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullable: Boolean = true

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double|float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n = x.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val hasNull = ctx.freshName("hasNull")
      // (double) getFloat(i) is the exact widening the transform-cast
      // produced; generated per the static element type of each side
      val getX =
        if (isFloat(left.dataType)) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getY =
        if (isFloat(right.dataType)) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  boolean $hasNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |    double $xv = $getX;
         |    double $yv = $getY;
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Register `graft_cosine_sim` in the session's function registry so it is
    * callable from `call_function` / SQL. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_sim",
      exprs => CosineSimilarity(exprs.head, exprs(1)),
      "built-in")
}
