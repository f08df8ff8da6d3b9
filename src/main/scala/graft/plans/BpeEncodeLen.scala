package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe_encode_len(word, mergesLiteral)` — number of BPE tokens a
  * word encodes to under rank-ordered merge rules, as one fused JVM loop.
  *
  * The declarative form (12 nested `aggregate` folds, each rebuilding a
  * symbol array element by element with `slice`+`concat`) evaluates the
  * whole chain per row with an array allocation per symbol per rule —
  * measured 14.5 s for q121 at sf0.1; this kernel does the same greedy
  * merges over two pointers in one `String[]` and brings the encode pass
  * to scan cost. Semantics are EXACTLY the fold's (and the reference
  * encoder's in `BpeTrainSpec`): base symbols are code points, each rule
  * scans left to right comparing the LAST WRITTEN symbol against `left`
  * — so a symbol merged by an earlier rule participates, and "aaa" under
  * (a,a) is ["aa","a"]. The rule matrix is fixed at plan time (a
  * reference object in generated code, like [[NearestCentroid]]'s
  * centers). Null word → null. */
case class BpeEncodeLen(child: Expression, merges: Array[Array[String]])
  extends UnaryExpression {

  require(merges.forall(_.length == 2), "merges must be (left, right) pairs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_bpe_encode_len"

  override protected def nullSafeEval(input: Any): Any =
    BpeEncodeLen.encodedLen(input.asInstanceOf[UTF8String], merges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("merges", merges, "java.lang.String[][]")
      s"${ev.value} = graft.plans.BpeEncodeLen.encodedLen($v, $m);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeLen {

  /** The fused encode. Public because generated code calls it. */
  def encodedLen(word: UTF8String, merges: Array[Array[String]]): Int = {
    val s = word.toString
    // code points, not UTF-16 units (the trainer's substring semantics)
    var n = 0
    var i = 0
    val syms = new Array[String](s.length)
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = s.substring(i, i + w)
      n += 1
      i += w
    }
    var r = 0
    while (r < merges.length && n > 1) {
      val a = merges(r)(0)
      val b = merges(r)(1)
      // two-pointer in-place greedy: compare the last WRITTEN symbol
      // (post-merge) against `a` — the fold's acc.last semantics
      var w = 0
      var k = 0
      while (k < n) {
        if (w > 0 && syms(k) == b && syms(w - 1) == a) {
          syms(w - 1) = a + b
        } else {
          syms(w) = syms(k)
          w += 1
        }
        k += 1
      }
      n = w
      r += 1
    }
    n
  }

  /** Function-registry builder: the second argument must be a foldable
    * array<array<string>> literal, decoded at expression-build time. */
  def builder(exprs: Seq[Expression]): BpeEncodeLen = {
    require(exprs.length == 2, "graft_bpe_encode_len(word, merges)")
    require(exprs(1).foldable, "merges must be a literal matrix")
    val ad = exprs(1).eval().asInstanceOf[ArrayData]
    val m = Array.tabulate(ad.numElements()) { i =>
      val row = ad.getArray(i)
      Array.tabulate(row.numElements())(j => row.getUTF8String(j).toString)
    }
    BpeEncodeLen(exprs.head, m)
  }

  /** Register `graft_bpe_encode_len`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_encode_len", builder, "built-in")

  /** Column form. */
  def encodeLen(word: org.apache.spark.sql.Column,
                merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_bpe_encode_len", word,
      org.apache.spark.sql.functions.typedLit(merges.map(p => Seq(p._1, p._2))))
}
