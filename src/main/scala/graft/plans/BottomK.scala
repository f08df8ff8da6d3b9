package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_bottomk(hash, value, k)` — the KMV (k-minimum-values) sample as a
  * native aggregate: keeps the `value`s of the k smallest `(hash, value)`
  * pairs per group and returns them as `array<double>` SORTED ASCENDING BY
  * VALUE (ready for rank-indexed quantile reads via `element_at`).
  *
  * This is the deterministic, ENGINE-PORTABLE quantile sketch (round-17,
  * q109's move from rows-only to hash-green): seed the hash with the
  * portable 60-bit md5 hash of a unique row key ([[Hash60]]) and the
  * selected sample — and therefore every quantile estimated from it — is a
  * pure function of the data, replayable in any engine as
  * `row_number() OVER (ORDER BY hash, value) <= k`. Spark's own
  * `approx_percentile` (Greenwald–Khanna) is partition-order dependent and
  * engine-specific, so it can only ever be self-gated.
  *
  * Eviction orders by the FULL `(hash, value)` pair, so hash collisions
  * cannot make the kept multiset scheduling-dependent. Rank error of a
  * quantile read at probability p is the bottom-k sampling error,
  * σ ≈ √(p(1−p)/k) — 0.5% at k = 10,000 for the median.
  *
  * Scale shape: TypedImperativeAggregate with a bounded binary max-heap —
  * k·16 bytes per group at every partial buffer and merge (map-side
  * combine works), one shuffle of k-bounded buffers regardless of group
  * size. Nulls in either input are skipped. */
case class BottomK(hashExpr: Expression, valueExpr: Expression, kExpr: Expression,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]]
    with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def first: Expression = hashExpr
  override def second: Expression = valueExpr
  override def third: Expression = kExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (hashExpr.dataType != LongType)
      TypeCheckFailure(s"$prettyName expects a bigint hash column, got ${hashExpr.dataType}")
    else if (valueExpr.dataType != DoubleType)
      TypeCheckFailure(s"$prettyName expects a double value column, got ${valueExpr.dataType}")
    else if (!kExpr.foldable ||
             !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckFailure(s"$prettyName expects a literal integer k")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckFailure(s"$prettyName expects k > 0")
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = false

  // max-heap on (hash, value): head is the current worst kept pair
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Double)]

  private def insert(buf: mutable.PriorityQueue[(Long, Double)],
                     h: Long, v: Double): Unit =
    if (buf.size < k) buf.enqueue((h, v))
    else {
      val worst = buf.head
      if (h < worst._1 || (h == worst._1 && v < worst._2)) {
        buf.dequeue(); buf.enqueue((h, v))
      }
    }

  override def update(buffer: mutable.PriorityQueue[(Long, Double)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val h = hashExpr.eval(input)
    val v = valueExpr.eval(input)
    if (h != null && v != null)
      insert(buffer, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[(Long, Double)],
                     other: mutable.PriorityQueue[(Long, Double)])
      : mutable.PriorityQueue[(Long, Double)] = {
    other.foreach { case (h, v) => insert(buffer, h, v) }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(Long, Double)]): Any =
    new GenericArrayData(buffer.toArray.map(_._2).sorted)

  override def serialize(buffer: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(4 + buffer.size * 16)
    val out = new DataOutputStream(bytes)
    out.writeInt(buffer.size)
    buffer.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val b = mutable.PriorityQueue.empty[(Long, Double)]
    var i = 0
    while (i < n) { b.enqueue((in.readLong(), in.readDouble())); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BottomK =
    copy(hashExpr = newFirst, valueExpr = newSecond, kExpr = newThird)

  override def prettyName: String = "graft_bottomk"
}

object BottomK {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "graft_bottomk(hash, value, k)")
    BottomK(exprs.head, exprs(1), exprs(2))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottomk", builder, "built-in")

  /** Column form (requires [[register]] or the session extensions). */
  def of(hash: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column,
         k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_bottomk", hash, value,
      org.apache.spark.sql.functions.lit(k))
}
