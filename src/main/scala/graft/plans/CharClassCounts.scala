package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_quality_counts(text)` — ONE fused byte scan computing the three
  * character-level signals the q27 quality score needs, replacing five
  * full string traversals with allocations (2× `regexp_replace` + length
  * diffs, plus the lower→pad→`replace` chain for the stopword count).
  * q27 was the worst regex-bound ratio on the sf1 board (Spark 2.5 s vs
  * DuckDB 0.19 s for pure per-row work); the kernel keeps the score
  * formula and the DuckDB oracle untouched — only the counting is fused.
  *
  * Semantics are EXACTLY the regex forms':
  *
  *  - `n_punct` = code points matching `[^a-zA-Z0-9_\s]` (Java `\s` is
  *    ASCII-only `[ \t\n\x0B\f\r]`; every non-ASCII code point matches
  *    the negated class — the scan counts each lead byte once and skips
  *    continuation bytes);
  *  - `n_digits` = code points matching `[0-9]`;
  *  - `n_stop` = NON-OVERLAPPING occurrences of `" the "` in the
  *    space-padded lowercased text, with replace-count semantics: a
  *    shared boundary space is consumed by the earlier match
  *    (`" the the "` counts ONE) and the scan resumes after the match;
  *  - `n_ws_tokens` (round-20) = EXACTLY
  *    `size(split(trim(text), "\\s+", -1))` — SQL `trim` strips 0x20
  *    SPACES only (not tabs/newlines); Java `Pattern.split` with
  *    limit −1 keeps leading AND trailing empty strings, so a trimmed
  *    non-empty string yields (number of maximal `\s`-runs) + 1 elements
  *    and the empty string yields 1 (`split("")` is `[""]`). Folding the
  *    count into this scan removes the full token-ARRAY allocation the
  *    `split` form paid per row just to take its size (q90/q27's
  *    dominant stage).
  *
  * Byte-level scanning is sound because the patterns are pure ASCII and
  * UTF-8 continuation/lead bytes all have the high bit set, so they can
  * never alias an ASCII byte; case-insensitive ASCII compare equals
  * scan-after-`lower()` because no non-ASCII code point lowercases to
  * ASCII `t`, `h` or `e` (the only ASCII-producing simple mappings are
  * U+212A→k and U+0130→i̇).
  *
  * Returns `struct<n_punct:long, n_digits:long, n_stop:long,
  * n_ws_tokens:long>`; null in → null out. Codegen-friendly: a static
  * call, same shape as [[DeflateSize]]. */
case class CharClassCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = CharClassCounts.Schema

  override def prettyName: String = "graft_quality_counts"

  override protected def nullSafeEval(input: Any): Any =
    CharClassCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharClassCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharClassCounts {

  val Schema: StructType = StructType(Seq(
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digits", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_ws_tokens", LongType, nullable = false)))

  /** The fused scan. Public because generated code calls it. */
  def counts(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    var punct = 0L
    var digits = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) != 0) {
        if ((b & 0xC0) != 0x80) punct += 1 // non-ASCII lead byte: one cp
      } else if (b >= '0' && b <= '9') digits += 1
      else if (!((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        b == '_' || b == ' ' || b == '\t' || b == '\n' ||
        b == 0x0B || b == '\f' || b == '\r')) punct += 1
      i += 1
    }
    // " the " over the virtually space-padded text: padded index j in
    // [0, n+2); j == 0 and j == n+1 are the pad spaces
    def p(j: Int): Byte = if (j == 0 || j == n + 1) ' ' else s.getByte(j - 1)
    def lower(b: Byte): Byte =
      if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
    var stop = 0L
    var j = 0
    val last = n + 2 - 5
    while (j <= last) {
      if (p(j) == ' ' && lower(p(j + 1)) == 't' && lower(p(j + 2)) == 'h' &&
        lower(p(j + 3)) == 'e' && p(j + 4) == ' ') {
        stop += 1
        j += 5 // non-overlap: the consumed trailing space can't re-match
      } else j += 1
    }
    // n_ws_tokens: replicate size(split(trim(text), "\s+", -1)) exactly.
    // trim strips 0x20 SPACES only; \s is ASCII [ \t\n\x0B\f\r] (all
    // single-byte in UTF-8, so the byte scan is sound — continuation and
    // lead bytes have the high bit set and never alias them).
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    var start = 0
    while (start < n && s.getByte(start) == ' ') start += 1
    var end = n - 1
    while (end >= start && s.getByte(end) == ' ') end -= 1
    var tokens = 1L // split("") == [""]; non-empty: runs + 1
    if (start <= end) {
      var k = start
      var prevWs = false
      while (k <= end) {
        val w = isWs(s.getByte(k))
        if (w && !prevWs) tokens += 1 // a new \s-run == one more element
        prevWs = w
        k += 1
      }
    }
    new GenericInternalRow(Array[Any](punct, digits, stop, tokens))
  }

  /** Register `graft_quality_counts(col)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quality_counts", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(c) => CharClassCounts(c)
    case exprs => throw new IllegalArgumentException(
      s"graft_quality_counts(col) takes one argument, got ${exprs.size}")
  }
}
