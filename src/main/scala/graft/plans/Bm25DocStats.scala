package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bm25_doc_stats(text, array('t1','t2',...))` — the BM25 per-doc
  * scan statistics as ONE fused pass over the string's UTF-8 bytes:
  * `struct(dl, cnts)` where `dl` is the non-empty whitespace-token count
  * (= `size(filter(graft_tokens(text), t -> t <> ''))`) and `cnts[i]` the
  * number of token instances equal to the i-th query term (= the `tf`
  * that `filter(__terms, isin(terms)) → explode → count` produced).
  *
  * Why (guide §4 — per-task work): the expression form materialized the
  * FULL token array of every document (one UTF8String per token) only to
  * count its length and keep the handful of query-term hits. This kernel
  * walks the same byte boundaries as [[Tokenize.tokenize]] (trim spaces,
  * lowercase once, split on ASCII `\s`) and allocates nothing per token —
  * one lowercased copy of the text and one fixed `long[|terms|]` per row.
  *
  * Value contract (differential-tested in `TermWeightingSpec`): `dl` and
  * `cnts` equal the expression form element for element, including the
  * empty / all-whitespace doc (dl 0, zero counts) and a null text (null
  * struct, exactly like `size(null)`). Terms are matched by exact UTF-8
  * bytes against the LOWERCASED tokens — callers pass lowercase terms,
  * same as they did to `isin`. */
case class Bm25DocStats(text: Expression, terms: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = terms

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, terms.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!terms.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: terms must be a literal array")
        else if (terms.eval() == null ||
          terms.eval().asInstanceOf[ArrayData].numElements() == 0)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: terms must be non-empty")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("cnts", ArrayType(LongType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_bm25_doc_stats"

  private lazy val termBytes: Array[Array[Byte]] = {
    val arr = terms.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).getBytes).toArray
  }

  override protected def nullSafeEval(s: Any, t: Any): Any =
    Bm25DocStats.compute(s.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termBytes", termBytes, "byte[][]")
    defineCodeGen(ctx, ev, (s, _) => s"graft.plans.Bm25DocStats.compute($s, $ref)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, terms = newRight)
}

object Bm25DocStats {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** One pass: non-empty-token count + per-term instance counts. Token
    * boundaries and lowercasing mirror [[Tokenize.tokenize]] exactly (the
    * "" artifacts that split-with-limit-(-1) keeps are zero-length slices
    * here and counted by neither output). */
  def compute(s: UTF8String, terms: Array[Array[Byte]]): InternalRow = {
    val t = s.trim().toLowerCase
    val bytes = t.getBytes
    val n = bytes.length
    val cnts = new Array[Long](terms.length)
    var dl = 0L
    var i = 0
    var start = 0
    def emit(from: Int, until: Int): Unit = if (until > from) {
      dl += 1
      var k = 0
      while (k < terms.length) {
        val tb = terms(k)
        if (tb.length == until - from) {
          var j = 0
          while (j < tb.length && tb(j) == bytes(from + j)) j += 1
          if (j == tb.length) cnts(k) += 1
        }
        k += 1
      }
    }
    while (i < n) {
      if (isWs(bytes(i))) {
        emit(start, i)
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    emit(start, n)
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(cnts)))
  }

  /** Register `graft_bm25_doc_stats(text, terms)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bm25_doc_stats", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(a, b) => Bm25DocStats(a, b)
    case exprs => throw new IllegalArgumentException(
      s"graft_bm25_doc_stats(text, terms) takes two arguments, got ${exprs.size}")
  }
}
