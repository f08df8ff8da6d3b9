package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_collect_capped_long(x, cap)` — `collect_list` over a long column
  * with a HARD per-group element cap: once a group (or a partial buffer
  * being merged) holds `cap` elements, further inputs are discarded.
  *
  * Why it exists: the bucket-pair dedup idiom (q44 containment, q22
  * jaccard) groups by fingerprint and collects the member doc ids, then
  * drops groups past a df threshold. With plain `collect_list` the size
  * filter runs AFTER collection, so one ubiquitous boilerplate
  * fingerprint shared by millions of documents at the 100 TB scale builds
  * a multi-million-element array inside a single aggregation buffer — an
  * executor OOM waiting for the wrong corpus. This aggregate makes the
  * cap part of the COLLECTION: per-group memory is `min(df, cap)` longs,
  * at every partial buffer and at the final merge, regardless of df.
  *
  * Contract: a group with `<= cap` inputs collects exactly its inputs
  * (order unspecified, like `collect_list`); a group with `> cap` inputs
  * yields SOME cap-element subset (which subset depends on scheduling).
  * Callers therefore pass `cap = threshold + 1` and filter
  * `size(ids) <= threshold` — overflowed groups deterministically fail
  * the filter, under-cap groups are complete, and the query result is
  * deterministic even though the overflow subset is not. Nulls are
  * skipped (collect_list's rule). */
case class CollectCappedLong(child: Expression, capExpr: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]]
    with BinaryLike[Expression] {

  private lazy val cap: Int = capExpr.eval().asInstanceOf[Number].intValue()

  override def left: Expression = child
  override def right: Expression = capExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != LongType)
      TypeCheckFailure(s"$prettyName expects a bigint column, got ${child.dataType}")
    else if (!capExpr.foldable ||
             !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(capExpr.dataType))
      TypeCheckFailure(s"$prettyName expects a literal integer cap")
    else if (capExpr.eval() == null || capExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckFailure(s"$prettyName expects cap > 0")
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty[Long]

  override def update(buffer: mutable.ArrayBuffer[Long],
                      input: InternalRow): mutable.ArrayBuffer[Long] = {
    if (buffer.length < cap) {
      val v = child.eval(input)
      if (v != null) buffer += v.asInstanceOf[Long]
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Long],
                     other: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    var i = 0
    while (buffer.length < cap && i < other.length) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(4 + buffer.length * 8)
    val out = new DataOutputStream(bytes)
    out.writeInt(buffer.length)
    var i = 0
    while (i < buffer.length) { out.writeLong(buffer(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val b = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { b += in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCappedLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCappedLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CollectCappedLong =
    copy(child = newLeft, capExpr = newRight)

  override def prettyName: String = "graft_collect_capped_long"
}

object CollectCappedLong {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_collect_capped_long(x, cap)")
    CollectCappedLong(exprs.head, exprs(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_collect_capped_long", builder, "built-in")

  /** Column form (requires [[register]] or the session extensions). */
  def of(x: org.apache.spark.sql.Column, cap: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_collect_capped_long", x,
      org.apache.spark.sql.functions.lit(cap))
}
