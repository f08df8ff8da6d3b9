package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `graft_winnow_hash60(tokens, n, w)` — MOSS winnowing fingerprints in
  * ONE fused native pass: positional n-gram 60-bit hashes
  * ([[NgramHash60]]'s rule) → minimum of every length-`w` window →
  * first-occurrence-deduplicated array.
  *
  * Why: the expression form of the window-min step allocates a `slice`
  * array per position and the dedup another pass — on top of the gram
  * hashing it kept the winnow family (q37/q44/q66) ~0.5 s above the scan
  * floor at sf1. The kernel computes window minima over a primitive long
  * array (w is small — 4 by default — so the O(positions·w) scan beats a
  * deque) and dedups into a HashSet, allocating only the output.
  *
  * Value contract (differential-tested in `TextDedupDifferentialSpec`):
  * SET-equal and order-equal to
  * `winnow(transform(positionalShinglesFromTokens(t, n), hash60), w)` —
  * array_distinct keeps first occurrences in order, and so does this.
  * Shorter-than-n docs yield an empty array; fewer than `w` hashes yield
  * the single global minimum (the [[graft.functions.TextFunctions.winnow]]
  * short-input rule). */
case class WinnowHash60(tokens: Expression, n: Expression, w: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = n
  override def third: Expression = w

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, n.dataType, w.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        if (!n.foldable || !w.foldable) TypeCheckResult.TypeCheckFailure(
          s"$prettyName: n and w must be literals")
        else w.eval() match {
          // w < 1 would walk past the hash array (i <= m - 0 reaches hs(m));
          // reject at analysis time — the function is session-registered and
          // reachable from SQL with any literal.
          case wv: Int if wv < 1 => TypeCheckResult.TypeCheckFailure(
            s"$prettyName: w must be >= 1, got $wv")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int, int), got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow_hash60"

  override protected def nullSafeEval(arr: Any, nv: Any, wv: Any): Any =
    WinnowHash60.winnowHash60(arr.asInstanceOf[ArrayData],
      nv.asInstanceOf[Int], wv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.plans.WinnowHash60.winnowHash60($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(tokens = newFirst, n = newSecond, w = newThird)
}

object WinnowHash60 {

  def winnowHash60(arr: ArrayData, n: Int, w: Int): ArrayData = {
    // Defense in depth behind checkInputDataTypes' analysis-time reject:
    // a direct caller with w=0 would index hs(m) in the window loop.
    if (w < 1) throw new IllegalArgumentException(
      s"graft_winnow_hash60: w must be >= 1, got $w")
    val hashes = NgramHash60.ngramHash60(arr, n)
    val m = hashes.numElements()
    if (m == 0) return hashes
    val hs = hashes.toLongArray()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    if (m < w) {
      var mn = hs(0)
      var i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      out += mn
    } else {
      var i = 0
      while (i <= m - w) {
        var mn = hs(i)
        var k = 1
        while (k < w) { if (hs(i + k) < mn) mn = hs(i + k); k += 1 }
        if (seen.add(mn)) out += mn
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Register `graft_winnow_hash60(tokens, n, w)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_hash60", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(a, b, c) => WinnowHash60(a, b, c)
    case exprs => throw new IllegalArgumentException(
      s"graft_winnow_hash60(tokens, n, w) takes three arguments, got ${exprs.size}")
  }
}
