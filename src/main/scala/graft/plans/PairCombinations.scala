package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** `graft_pair_combinations(arr)` — all ordered element pairs (i < j) of an
  * array, as `array<struct<x: T, y: T>>`, in (i, j) lexicographic order.
  *
  * Why: the declarative bucket-pair idiom
  * `flatten(transform(arr, (x, i) -> transform(slice(arr, i+2, n), y -> struct(x, y))))`
  * allocates a sliced array per outer element and a nested array-of-arrays
  * before `flatten` copies everything again — for a bucket of m members
  * that is O(m) array allocations and three copies of the O(m²) pair set
  * (measured as the dominant slice of q22's pair stage). The kernel emits
  * the flat pair array in ONE pass with exactly one copy of each element
  * pair.
  *
  * Value contract (differential-tested in TextDedupDifferentialSpec):
  * element-for-element equal to the flatten/transform/slice chain above for
  * any element type. Arrays of size < 2 yield an empty array; a null array
  * yields null; null ELEMENTS are carried through as-is (same as the
  * declarative chain). Elements are deep-copied out of the input buffer so
  * the result owns its memory. */
case class PairCombinations(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array input, got ${other.simpleString(10)}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("x", elemType, elemNullable),
      StructField("y", elemType, elemNullable))),
    containsNull = false)

  override def prettyName: String = "graft_pair_combinations"

  override protected def nullSafeEval(arr: Any): Any =
    PairCombinations.pairs(arr.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev,
      a => s"graft.plans.PairCombinations.pairs($a, $et)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairCombinations {

  def pairs(arr: ArrayData, elemType: DataType): ArrayData = {
    val m = arr.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    // deep-copy each element once; pairs then share the copies
    val elems = new Array[Any](m)
    var i = 0
    while (i < m) {
      elems(i) = InternalRow.copyValue(arr.get(i, elemType))
      i += 1
    }
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out(k) = InternalRow(elems(i), elems(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `graft_pair_combinations(arr)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pair_combinations", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(a) => PairCombinations(a)
    case exprs => throw new IllegalArgumentException(
      s"graft_pair_combinations(arr) takes one argument, got ${exprs.size}")
  }
}
