package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** `graft_ngram_hash60(tokens, n)` — POSITIONAL word n-gram hashes as one
  * fused native pass: for every window of `n` consecutive tokens, the
  * portable 60-bit hash ([[Hash60]]) of the space-joined gram, in document
  * order (duplicates kept).
  *
  * Why: the expression form builds each gram as a string
  * (`slice` allocates an array per gram, `array_join` a string, the hash
  * another) — for q133's 8M grams at sf1 that is 24M short-lived
  * allocations before a single byte is aggregated, and it measured as the
  * pipeline's dominant cost even after [[Hash60]] removed the hex
  * round-trip. The kernel decodes each token's UTF-8 bytes ONCE per row
  * and streams gram bytes straight into a per-thread MessageDigest — no
  * gram string ever exists.
  *
  * Value contract (differential-tested in `TextDedupDifferentialSpec`):
  * element-for-element equal to
  * `transform(positionalShinglesFromTokens(toks, n), s => hash60(s))`,
  * and therefore to the DuckDB oracle twin
  * `[('0x'||substr(md5(gram),1,15))::BIGINT ...]`. Shorter-than-n token
  * arrays yield an empty array (the callers' in-expression guard). Null
  * token elements (impossible under the `tokens()` contract, but reachable
  * from SQL) raise a descriptive IllegalArgumentException; a null ARRAY
  * yields null. */
case class NgramHash60(tokens: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, n.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (n.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: n must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_ngram_hash60"

  override protected def nullSafeEval(arr: Any, nv: Any): Any =
    NgramHash60.ngramHash60(arr.asInstanceOf[ArrayData], nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.NgramHash60.ngramHash60($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, n = newRight)
}

object NgramHash60 {

  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def ngramHash60(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (n <= 0 || len < n) return new GenericArrayData(Array.empty[Long])
    // decode every token's UTF-8 bytes exactly once per row
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      // The tokens() contract never yields null elements, but the function
      // is session-registered and SQL-callable with containsNull arrays —
      // fail with a descriptive error instead of an opaque task NPE.
      if (s == null) throw new IllegalArgumentException(
        s"graft_ngram_hash60: token array contains a null element at index $i; " +
          "tokens must be non-null strings")
      toks(i) = s.getBytes
      i += 1
    }
    val md = local.get()
    val out = new Array[Long](len - n + 1)
    i = 0
    while (i <= len - n) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(' '.toByte)
        md.update(toks(i + k))
        k += 1
      }
      val d = md.digest()
      // top 60 bits: bytes 0..6 in full + high nibble of byte 7 — the
      // value of the first 15 md5 hex chars parsed base-16 (Hash60's rule)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = (v << 4) | ((d(7) & 0xffL) >>> 4)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Register `graft_ngram_hash60(tokens, n)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_hash60", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(a, b) => NgramHash60(a, b)
    case exprs => throw new IllegalArgumentException(
      s"graft_ngram_hash60(tokens, n) takes two arguments, got ${exprs.size}")
  }
}
