package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd sign-LSH signature: bit j of the result is the sign of
  * dot(v, planes(j)), for a hyperplane matrix fixed at plan time.
  *
  * The declarative form — one `aggregate(zip_with(...))` per plane — is a
  * higher-order function, which Spark executes as CodegenFallback:
  * interpreted per row with a closure call per element (measured ~0.6 ms/row
  * at nBits=8 × dim=64 — that is the index build's bottleneck, and at
  * corpus scale it is paid for every row). This expression is one fused
  * nBits × dim loop inside WholeStageCodegen.
  *
  * Accumulation order per plane is the HOF fold's left-to-right order, so
  * sign decisions — and therefore bucket assignments and the DuckDB oracle
  * parity built on them — are bit-identical. Null vectors yield null;
  * a vector whose length differs from the plane dimension yields null. */
case class SignLshBits(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes.head.length),
    "planes must be a non-empty rectangular matrix")

  override def nullable: Boolean = true

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sign_lsh_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = planes.head.length
    if (v.numElements() != dim) return null
    var sig = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += v.getDouble(i) * p(i); i += 1 }
      if (dot >= 0) sig |= 1 << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("planes", planes, "double[][]")
      val dim = planes.head.length
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $sig = 0;
         |  for (int $j = 0; $j < ${planes.length}; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $v.getDouble($i) * $m[$j][$i];
         |    }
         |    if ($dot >= 0) $sig |= 1 << $j;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshBits {
  /** Function-registry builder (shared by [[register]] and
    * [[GraftExtensions]]): the second argument must be a foldable
    * array<array<double>> literal, decoded into the plane matrix at
    * expression-build time. */
  def builder(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): SignLshBits = {
    require(exprs(1).foldable, "planes must be a literal matrix")
    val ad = exprs(1).eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    SignLshBits(exprs.head, m)
  }

  /** Register `graft_sign_lsh_bits(v, planesLiteral)`. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sign_lsh_bits", builder, "built-in")

  /** Column form: signature of `v` against `planes`. */
  def assign(v: org.apache.spark.sql.Column,
             planes: Array[Array[Double]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_sign_lsh_bits", v,
      org.apache.spark.sql.functions.typedLit(planes.map(_.toSeq).toSeq))
}
