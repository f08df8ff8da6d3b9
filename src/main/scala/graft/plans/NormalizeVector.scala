package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd L2 normalization: `array<float|double>` in,
  * unit-length `array<double>` out.
  *
  * The declarative form — `transform(v, cast)` + `aggregate` for the norm +
  * `transform(v, _ / norm)` — is three higher-order functions, all
  * CodegenFallback (interpreted, closure call per element); this was the
  * measured bottleneck of every similarity path that pre-normalizes. Here:
  * one fused pass for the norm, one for the divide, allocated once.
  *
  * Float input is widened to double BEFORE the square (same as the
  * `toDoubleArray ∘ transform` chain), and the norm accumulates in the
  * HOF fold's left-to-right order — results are bit-identical to the
  * declarative form on null-free vectors (the embedding contract). Null
  * arrays yield null; a null ELEMENT yields null (the HOF chain would
  * yield an array of nulls — poisoned either way, never silently wrong). */
case class NormalizeVector(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_l2_normalize"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x / norm
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val get = if (isFloat) s"(double) $v.getFloat" else s"$v.getDouble"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val hasNull = ctx.freshName("hasNull")
      val x = ctx.freshName("x")
      s"""
         |int $n = $v.numElements();
         |double $ss = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { $hasNull = true; break; }
         |  double $x = $get($i);
         |  $ss += $x * $x;
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $norm = java.lang.Math.sqrt($ss);
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $get($i) / $norm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeVector {
  /** Register `graft_l2_normalize(v)`. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2_normalize",
      exprs => NormalizeVector(exprs.head), "built-in")

  def normalize(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_l2_normalize", v)
}
