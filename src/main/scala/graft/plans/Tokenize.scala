package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_tokens(text)` — the engine's whitespace tokenizer
  * `split(lower(trim(text)), '\s+')` as ONE fused native pass over the
  * string's UTF-8 bytes, with no regex engine and no intermediate string.
  *
  * Why: every text operator (shingles, minhash, BPE, term weighting,
  * quality stats) starts from this projection, and the expression form
  * pays a Java `Pattern` machine per token boundary plus a full
  * decode-to-String round trip — measured as the dominant slice of the
  * documents-scan floor once the per-operator work moved into kernels.
  * Byte-level splitting is correct because Java's `\s` (no UNICODE flag)
  * is exactly the ASCII set `[ \t\n\x0B\f\r]`, and in UTF-8 those byte
  * values never occur inside a multi-byte code point.
  *
  * Value contract (differential-tested in `TokenizeSpec`, element for
  * element): equal to `split(lower(trim(text)), '\s+')` —
  *  - `trim` removes SPACES only (0x20, Spark's StringTrim rule), so a
  *    leading tab/newline yields a leading "" element and a trailing one
  *    yields a trailing "" element (Java split with limit -1 keeps it);
  *  - the empty / all-space string yields `[""]`, not `[]`;
  *  - lowercasing is [[UTF8String.toLowerCase]] — identical to `lower()`;
  *  - non-ASCII whitespace (U+00A0 etc.) does NOT split, same as `\s`.
  * Callers that need only the non-empty tokens keep their existing
  * `filter(_ =!= "")` on top, exactly as with the expression form. */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(s: Any): Any =
    Tokenize.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Tokenize.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokenize {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def tokenize(s: UTF8String): ArrayData = {
    // trim = spaces only (StringTrim's rule), then lower the whole slice
    // once — lowercasing never creates or destroys ASCII whitespace bytes
    val t = s.trim().toLowerCase
    val bytes = t.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    var start = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        // leading separator run emits the "" Java split keeps at limit -1
        out += UTF8String.fromBytes(bytes, start, i - start)
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    // start == n exactly when the string ends in a separator run — the
    // trailing "" element limit -1 keeps
    out += UTF8String.fromBytes(bytes, start, n - start)
    new GenericArrayData(out.toArray)
  }

  /** Register `graft_tokens(text)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_tokens", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(c) => Tokenize(c)
    case exprs => throw new IllegalArgumentException(
      s"graft_tokens(text) takes one argument, got ${exprs.size}")
  }
}
