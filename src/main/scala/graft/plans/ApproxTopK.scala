package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter sketch as a native aggregate:
  * `graft_approx_topk(term, k)` → `array<struct<term:string, cnt:bigint>>`
  * (descending estimated count, term-ascending ties).
  *
  * The 100 TB story: an exact term count over a web-scale corpus shuffles one
  * row per distinct term (fine, but the term cardinality of raw text is
  * itself huge). This sketch keeps AT MOST `k` counters per partial
  * aggregate — each task summarizes its whole partition into ≤ k rows, the
  * final merge is over #tasks × k rows, and no per-term exchange ever
  * happens. The classic guarantees (Misra & Gries 1982; merge form Agarwal
  * et al., PODS 2012) hold under Spark's partial/merge execution because the
  * merge step is itself a Misra–Gries reduction:
  *
  *  - every item with true frequency > N/(k+1) is present in the result;
  *  - each reported count undercounts the true count by at most N/(k+1).
  *
  * So `graft_approx_topk(term, 10*k)` then an exact count of the ≤ 10*k
  * surviving candidates is the two-pass exact-top-k pattern when the
  * frequency-gap condition holds. Deterministic given the same input
  * multiset? NO across repartitions (the summary depends on merge order) —
  * which is why the declared query surface uses the exact aggregation and
  * this sketch is spec-verified against its guarantees instead of a
  * cross-engine hash oracle.
  */
case class ApproxTopK(child: Expression, kExpr: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def left: Expression = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"graft_approx_topk expects a string column, got ${child.dataType}")
    else if (!kExpr.foldable ||
             !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckFailure("graft_approx_topk expects a literal integer k")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
      TypeCheckFailure("graft_approx_topk expects k > 0")
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Classic MG update: increment a tracked counter, adopt a free slot, or
    * decrement the whole summary (the "pay one token from every counter"
    * step — O(k) but only on overflow, amortized O(1) per stream element). */
  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val term = v.asInstanceOf[UTF8String].toString
    buffer.get(term) match {
      case Some(c) => buffer.update(term, c + 1)
      case None if buffer.size < k => buffer.update(term, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buffer.keysIterator.foreach { t =>
          val c = buffer(t) - 1
          if (c == 0L) dead += t else buffer.update(t, c)
        }
        dead.foreach(buffer.remove)
    }
    buffer
  }

  /** MG merge (Agarwal et al.): counter-wise sum, then subtract the
    * (k+1)-th largest count from every counter and drop the non-positive —
    * the result is again a valid k-counter MG summary of the combined
    * stream. */
  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buffer.update(t, buffer.getOrElse(t, 0L) + c)
    }
    if (buffer.size > k) {
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.keysIterator.foreach { t =>
        val c = buffer(t) - sub
        if (c <= 0L) dead += t else buffer.update(t, c)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buffer.size)
    buffer.foreach { case (t, c) =>
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(tb.length); out.write(tb); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val tb = new Array[Byte](len)
      in.readFully(tb)
      m.update(new String(tb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ApproxTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): ApproxTopK =
    copy(child = newLeft, kExpr = newRight)

  override def prettyName: String = "graft_approx_topk"
}

object ApproxTopK {
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "graft_approx_topk(term, k)")
    ApproxTopK(exprs.head, exprs(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_approx_topk", builder, "built-in")

  /** Column form (requires [[register]] or the session extensions). */
  def of(term: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_approx_topk", term,
      org.apache.spark.sql.functions.lit(k))
}
