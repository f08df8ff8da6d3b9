package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema-evolution reads: union data written under different schema
  * versions (columns added over time, numeric columns widened) into one
  * frame under the evolved schema.
  *
  * A long-lived 100 TB lake is never one schema: early files lack columns
  * later files carry, and a column that started as INT is a BIGINT or
  * DOUBLE two years later. Two paths:
  *
  *  - [[readEvolved]]: parquet-level `mergeSchema` — Spark reconciles the
  *    footers at scan time (adds missing columns as null, widens where
  *    parquet supports it). Preferred when all versions live in one lake
  *    dir: ONE scan node, full pushdown/pruning.
  *  - [[unionEvolved]]: relational reconciliation over already-loaded
  *    frames — computes the evolved schema (first-seen column order,
  *    numeric widening ladder byte→short→int→long / float→double →
  *    double), casts each input up, null-fills absent columns, and
  *    `UNION ALL`s. Needed when the versions come from different sources
  *    (e.g. a JDBC dim v1 + a parquet dim v2) where no single scan can
  *    reconcile.
  *
  * Both are narrow per-row transformations: no shuffle, casts codegen'd
  * into the scan stage.
  */
object SchemaEvolution {

  private val numericLadder: IndexedSeq[DataType] =
    IndexedSeq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  /** Widest common type of two column versions. Identical types pass
    * through; numeric types widen up the ladder (int+long→long,
    * long+double→double); anything else is a genuine conflict and throws —
    * silent coercion of e.g. string+int would corrupt the lake. */
  def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else if (a == NullType) b
    else if (b == NullType) a
    else (a, b) match {
      // decimal precision/scale growth (money columns widened over time):
      // keep max integral digits and max scale — lossless for both sides
      case (da: DecimalType, db: DecimalType) =>
        val (p1, s1, p2, s2) = (da.precision, da.scale, db.precision, db.scale)
        val scale = math.max(s1, s2)
        val integral = math.max(p1 - s1, p2 - s2)
        DecimalType(math.min(integral + scale, DecimalType.MAX_PRECISION), scale)
      case _ =>
        (numericLadder.indexOf(a), numericLadder.indexOf(b)) match {
          case (i, j) if i >= 0 && j >= 0 => numericLadder(math.max(i, j))
          case _ => throw new IllegalArgumentException(
            s"incompatible schema evolution: ${a.simpleString} vs ${b.simpleString}")
        }
    }

  /** Evolved schema over all versions: first-seen column order, widened
    * types, a column nullable once any version lacks it or allows null.
    * Column names match with Spark's default CASE-INSENSITIVE resolution
    * (first-seen casing wins) unless `caseSensitive` — otherwise two
    * versions carrying `Price` and `price` would evolve into two distinct
    * columns instead of widening. */
  def evolvedSchema(schemas: Seq[StructType], caseSensitive: Boolean = false): StructType = {
    require(schemas.nonEmpty, "no schemas to evolve")
    def key(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    schemas.foreach { s =>
      s.fields.foreach { f =>
        order.get(key(f.name)) match {
          case None => order += key(f.name) -> f
          case Some(prev) =>
            order += key(f.name) -> StructField(prev.name,
              widen(prev.dataType, f.dataType), prev.nullable || f.nullable)
        }
      }
    }
    // a column absent from ANY version is nullable in the union
    StructType(order.toSeq.map { case (k, f) =>
      if (schemas.exists(s => !s.fieldNames.exists(n => key(n) == k)))
        f.copy(nullable = true)
      else f
    })
  }

  /** UNION ALL across schema versions under the evolved schema. Name
    * matching follows `caseSensitive` like [[evolvedSchema]] — a frame's
    * `PRICE` feeds the evolved `price` column rather than being null-filled. */
  def unionEvolved(dfs: Seq[DataFrame], caseSensitive: Boolean = false): DataFrame = {
    def key(n: String) = if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    val target = evolvedSchema(dfs.map(_.schema), caseSensitive)
    dfs.map { df =>
      val byKey = df.columns.map(c => key(c) -> c).toMap
      val cols: Seq[Column] = target.fields.toSeq.map { f =>
        byKey.get(key(f.name)) match {
          case Some(actual) => col(actual).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }
      df.select(cols: _*)
    }.reduce(_.unionAll(_))
  }

  /** Scan-level evolution over parquet paths written with different
    * schemas: one relation, footer-merged schema, pushdown intact. */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
