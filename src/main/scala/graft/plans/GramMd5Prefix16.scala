package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_gram_md5_16(tokens, k)` — POSITIONAL word k-gram md5 prefixes as
  * one fused native pass: for every window of `k` consecutive tokens, the
  * first 16 hex chars of `md5(space-joined gram)`, in document order.
  *
  * Why ([[NgramHash60]]'s argument, for the span-dedup family that needs
  * the STRING prefix rather than the 60-bit long — [[graft.operators.SpanDedup]]'s
  * gram hashes are `substr(md5(g), 1, 16)` in the committed q100/q101
  * oracles, so the value domain cannot change): the expression form
  * allocates a sliced array, a joined string, a 32-char hex string and a
  * substring per gram — the measured majority of q100/q101's one heavy
  * map stage. The kernel decodes each token's UTF-8 bytes once per row
  * and streams gram bytes into a per-thread MessageDigest; only the
  * 16-byte output string is ever allocated.
  *
  * Value contract (differential-tested in SpanDedupSpec): element-for-
  * element equal to
  * `transform(sequence(1, size-k+1), i -> substring(md5(concat_ws(" ",
  * slice(toks, i, k))), 1, 16))`, and therefore to the DuckDB twin
  * `substr(md5(array_to_string(t[i:i+k-1], ' ')), 1, 16)`. Shorter-than-k
  * arrays yield an empty array; null token elements raise a descriptive
  * error; a null array yields null. */
case class GramMd5Prefix16(tokens: Expression, k: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = k

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, k.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (k.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_gram_md5_16"

  override protected def nullSafeEval(arr: Any, kv: Any): Any =
    GramMd5Prefix16.gramMd5Prefix16(arr.asInstanceOf[ArrayData], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.GramMd5Prefix16.gramMd5Prefix16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, k = newRight)
}

object GramMd5Prefix16 {

  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".getBytes

  def gramMd5Prefix16(arr: ArrayData, k: Int): ArrayData = {
    val len = arr.numElements()
    if (k <= 0 || len < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      if (s == null) throw new IllegalArgumentException(
        s"graft_gram_md5_16: token array contains a null element at index $i; " +
          "tokens must be non-null strings")
      toks(i) = s.getBytes
      i += 1
    }
    val md = local.get()
    val out = new Array[Any](len - k + 1)
    i = 0
    while (i <= len - k) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(i + j))
        j += 1
      }
      val d = md.digest()
      // first 16 hex chars = bytes 0..7, lowercase — Spark md5()'s encoding
      val hex = new Array[Byte](16)
      var b = 0
      while (b < 8) {
        hex(2 * b) = HexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexChars(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `graft_gram_md5_16(tokens, k)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gram_md5_16", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(a, b) => GramMd5Prefix16(a, b)
    case exprs => throw new IllegalArgumentException(
      s"graft_gram_md5_16(tokens, k) takes two arguments, got ${exprs.size}")
  }
}
