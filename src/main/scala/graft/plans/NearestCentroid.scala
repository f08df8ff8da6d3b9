package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd IVF cell assignment: index of the nearest centroid (by
  * squared Euclidean distance, first-wins on ties) for an `array<double>`
  * vector, against a centroid matrix fixed at plan time.
  *
  * This is the distributed half of the sample-fit / broadcast-assign KMeans
  * shape ([[graft.operators.Similarity.Ivf]]): centers are trained
  * driver-side on a bounded sample, then shipped into the generated code as
  * a reference object — the assignment pass is one fused loop per row
  * inside WholeStageCodegen, no MLlib job graph, no intermediate vector
  * conversions. Rows whose vector is null or whose length differs from the
  * centroid dimension yield null. */
case class NearestCentroid(child: Expression, centers: Array[Array[Double]])
  extends UnaryExpression {

  require(centers.nonEmpty && centers.forall(_.length == centers.head.length),
    "centers must be a non-empty rectangular matrix")

  override def nullable: Boolean = true

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = centers.head.length
    if (v.numElements() != dim) return null
    var best = -1
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val diff = v.getDouble(i) - ctr(i)
        d += diff * diff
        i += 1
      }
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("centers", centers, "double[][]")
      val dim = centers.head.length
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1;
         |  double $bestDist = Double.MAX_VALUE;
         |  for (int $c = 0; $c < ${centers.length}; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $diff = $v.getDouble($i) - $m[$c][$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestDist) { $bestDist = $d; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  /** Function-registry builder (shared by [[register]] and
    * [[GraftExtensions]]): the second argument must be a foldable
    * array<array<double>> literal, decoded into the center matrix at
    * expression-build time. */
  def builder(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): NearestCentroid = {
    require(exprs(1).foldable, "centers must be a literal matrix")
    val ad = exprs(1).eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
    NearestCentroid(exprs.head, m)
  }

  /** Register `graft_nearest_centroid(v, centersLiteral)`. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_centroid", builder, "built-in")

  /** Column form: nearest-centroid id of `v` against `centers`. */
  def assign(v: org.apache.spark.sql.Column,
             centers: Array[Array[Double]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_nearest_centroid", v,
      org.apache.spark.sql.functions.typedLit(centers.map(_.toSeq).toSeq))
}
