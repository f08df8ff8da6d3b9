package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_deflate_len(col)` — DEFLATE-compressed byte length of a string's
  * UTF-8 bytes (or a binary column), as a native codegen'd expression.
  *
  * Why: compression ratio is a standard text-quality signal for training
  * -data curation (highly repetitive / boilerplate / machine-generated text
  * compresses far better than natural prose — the Gopher/CCNet-family
  * "compressibility" heuristic). Computing it needs a real compressor;
  * there is no declarative Spark or DuckDB equivalent, so the operator is
  * rows-only at the correctness gate and property-tested in
  * `CompressibilitySpec` instead (determinism, monotonicity on repetition,
  * interpreted == codegen).
  *
  * Execution shape: one pass, no shuffle, whole-stage-codegen friendly
  * (the kernel is a static call like [[EditDistanceCapped]]). A `Deflater`
  * is ~64 KB of native state and expensive to allocate, so instances are
  * reused per thread via a ThreadLocal with `reset()` between rows; output
  * bytes are drained into a per-thread scratch buffer and only counted,
  * never materialized. Level 6 (zlib default) everywhere — the level is
  * part of the signal's definition, not a tuning knob.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary argument, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => DeflateSize.deflatedLen(s.getBytes)
    case b: Array[Byte] => DeflateSize.deflatedLen(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val toBytes = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case BinaryType => (c: String) => c
    }
    defineCodeGen(ctx, ev,
      c => s"graft.plans.DeflateSize.deflatedLen(${toBytes(c)})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {

  private val local = new ThreadLocal[(Deflater, Array[Byte])] {
    override def initialValue(): (Deflater, Array[Byte]) =
      (new Deflater(Deflater.DEFAULT_COMPRESSION), new Array[Byte](8192))
  }

  /** Total DEFLATE output length for `bytes` at zlib default level. */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val (deflater, buf) = local.get()
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    var total = 0
    while (!deflater.finished()) total += deflater.deflate(buf)
    total
  }

  /** Register `graft_deflate_len(col)`; idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deflate_len", builder, "built-in")

  def builder: Seq[Expression] => Expression = {
    case Seq(c) => DeflateSize(c)
    case exprs => throw new IllegalArgumentException(
      s"graft_deflate_len(col) takes one argument, got ${exprs.size}")
  }
}
