package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Capped edit distance as a native codegen'd expression: returns the exact
  * Levenshtein distance when it is ≤ `cap`, and -1 otherwise.
  *
  * Why not the built-in `levenshtein`: Spark's kernel walks the DP matrix
  * through `UTF8String` code-point decoding, where random access is O(pos)
  * in the byte array — the DP degrades to O(n³) per pair (measured ~49µs
  * for an 80×80 pair; 25k candidate pairs cost >1.2s of a 2.1s query).
  * This expression decodes BOTH strings to code-point arrays once (O(n)),
  * then runs a primitive-int two-row DP restricted to the ±cap Ukkonen
  * band with an early exit as soon as a row's minimum exceeds the cap —
  * O(n·min(n,cap)) with O(1) cell access. Distances ≤ cap are EXACTLY the
  * plain Levenshtein values (the band provably contains every path of
  * weight ≤ cap), so swapping this in changes no kept row.
  */
case class EditDistanceCapped(left: Expression, right: Expression, cap: Int)
  extends BinaryExpression {

  require(cap >= 0, s"edit-distance cap must be >= 0, got $cap")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_edit_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceCapped.capped(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.EditDistanceCapped.capped($a, $b, $cap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object EditDistanceCapped {

  // manual decode (no IntStream machinery): BMP-only strings copy chars
  // straight through; surrogate pairs fall back to the codePointAt walk
  private def codePointArray(str: String): Array[Int] = {
    val n = str.length
    var hasSurrogate = false
    var i = 0
    while (i < n && !hasSurrogate) {
      if (Character.isHighSurrogate(str.charAt(i))) hasSurrogate = true
      i += 1
    }
    if (!hasSurrogate) {
      val out = new Array[Int](n)
      var k = 0
      while (k < n) { out(k) = str.charAt(k); k += 1 }
      out
    } else {
      val out = new Array[Int](str.codePointCount(0, n))
      var k = 0
      i = 0
      while (i < n) {
        val cp = str.codePointAt(i)
        out(k) = cp
        k += 1
        i += Character.charCount(cp)
      }
      out
    }
  }

  /** Exact Levenshtein distance if ≤ cap, else -1. Code-point semantics —
    * identical to Spark's `levenshtein` for every pair it keeps. */
  def capped(a: UTF8String, b: UTF8String, cap: Int): Int = {
    var s = codePointArray(a.toString)
    var t = codePointArray(b.toString)
    if (s.length < t.length) { val tmp = s; s = t; t = tmp }
    val n = s.length
    val m = t.length
    // cheap lower bound: d >= |n - m|
    if (n - m > cap) return -1
    if (m == 0) return if (n <= cap) n else -1

    val big = cap + 1 // "outside the band" sentinel; never wins a min
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= cap) j else big; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - cap)
      val hi = math.min(m, i + cap)
      curr(lo - 1) = if (i <= cap && lo == 1) i else big
      var rowMin = curr(lo - 1)
      j = lo
      while (j <= hi) {
        val cost = if (s(i - 1) == t(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = curr(j - 1) + 1
        if (ins < v) v = ins
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      // the band's upper edge moves right next row: poison the cell the
      // next row will read as prev(j) just past this row's band
      if (hi < m) curr(hi + 1) = big
      if (rowMin > cap) return -1
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    if (prev(m) <= cap) prev(m) else -1
  }

  /** Register `graft_edit_distance(left, right, cap)` in the session's
    * function registry (third argument must be an integer literal).
    * Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_edit_distance", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(l, r, Literal(c: Int, IntegerType)) => EditDistanceCapped(l, r, c)
    case exprs => throw new IllegalArgumentException(
      "graft_edit_distance(left, right, cap) requires an integer literal " +
        s"cap, got ${exprs.map(_.sql).mkString(", ")}")
  }
}
