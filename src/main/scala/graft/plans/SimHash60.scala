package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `graft_simhash60(tokens)` — the 60-bit SimHash of a token array as ONE
  * fused per-row pass: hash each token ([[Hash60]], the portable md5-top-60
  * map), vote each bit ±1, set bit b iff its vote sum is positive.
  *
  * Why: the aggregate formulation explodes every token into a row and
  * shuffles the whole token stream into a 60-conditional-sum groupBy —
  * q21's dominant cost at sf1 (the signature is a PER-DOCUMENT value, so
  * the exchange moved corpus-sized data to compute row-local results, the
  * same argument as repetitionStats' round-15 rewrite). The kernel folds
  * hash + votes + sign assembly into one loop at the scan's parallelism:
  * no explode, no exchange, no 60-expression aggregation buffer.
  *
  * Value contract (differential-tested in `TextDedupDifferentialSpec`
  * against the explode + SUM(±1) + shiftleft assembly twin): bit-identical
  * — integer vote sums are order-insensitive, and the per-token hash is
  * [[Hash60.hash60]] exactly, so the DuckDB oracle twin
  * (`('0x'||substr(md5(t),1,15))::BIGINT` per token, SUM(±1) per bit)
  * mirrors by construction. Empty arrays vote nothing → signature 0 (the
  * aggregate twin never sees an empty array: the tokenizer yields [""] at
  * minimum, whose single hash votes every bit).
  *
  * Null token elements raise a descriptive error (the [[NgramHash60]]
  * boundary rule — the function is session-registered and SQL-reachable,
  * an opaque NPE would surface as a task failure). */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash60"

  override protected def nullSafeEval(arr: Any): Any =
    SimHash60.simhash60(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash60.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {

  def simhash60(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s == null) throw new IllegalArgumentException(
        s"graft_simhash60: null token at position $i — the tokens() " +
        "contract is non-null elements (filter or coalesce upstream)")
      val h = Hash60.hash60(s)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Register `graft_simhash60(tokens)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash60", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(c) => SimHash60(c)
    case exprs => throw new IllegalArgumentException(
      s"graft_simhash60(tokens) takes one argument, got ${exprs.size}")
  }
}
