package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_hash60(str)` — the engine-portable 60-bit hash
  * (`conv(substring(md5(s), 1, 15), 16, 10)`) as ONE native codegen'd
  * expression producing the long directly from the digest bytes.
  *
  * Why: the expression form materializes a 32-char hex UTF8String per
  * value (md5), substrings it, then PARSES 15 hex chars back into a long
  * (conv) — measured ~1.5 µs per gram, which made the round-15 hash-gram
  * move a net LOSS on q133 (9.9 s → 13.2 s at sf1: the aggregation got
  * cheaper but the hashing got slower). The kernel runs MessageDigest on
  * the UTF-8 bytes and assembles the top 60 bits with shifts — no hex
  * string, no substring, no base-16 parse — leaving the md5 itself as the
  * only per-value cost.
  *
  * Value contract (differential-tested in `TextDedupDifferentialSpec`):
  * bit-identical to the expression form, and therefore to the DuckDB
  * oracle twin `('0x'||substr(md5(s),1,15))::BIGINT`. First 15 hex chars
  * = digest bytes 0..6 in full plus the HIGH nibble of byte 7.
  *
  * Execution shape: scalar, one pass, whole-stage-codegen friendly
  * (static call like [[DeflateSize]]); MessageDigest instances are reused
  * per thread. */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {

  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(s): bytes 0..6 in full, high nibble of byte 7 —
    * exactly the value of the first 15 hex chars parsed base-16. */
  def hash60(s: UTF8String): Long = {
    val md = local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Register `graft_hash60(col)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash60", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(c) => Hash60(c)
    case exprs => throw new IllegalArgumentException(
      s"graft_hash60(col) takes one argument, got ${exprs.size}")
  }
}
