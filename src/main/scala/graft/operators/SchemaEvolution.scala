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
    * types, a column nullable once any version lacks it or allows null. */
  def evolvedSchema(schemas: Seq[StructType]): StructType = {
    require(schemas.nonEmpty, "no schemas to evolve")
    val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    schemas.foreach { s =>
      s.fields.foreach { f =>
        order.get(f.name) match {
          case None => order += f.name -> f
          case Some(prev) =>
            order += f.name -> StructField(f.name, widen(prev.dataType, f.dataType),
              prev.nullable || f.nullable)
        }
      }
    }
    // a column absent from ANY version is nullable in the union
    val names = order.keySet.toSeq
    StructType(names.map { n =>
      val f = order(n)
      if (schemas.exists(s => !s.fieldNames.contains(n))) f.copy(nullable = true) else f
    })
  }

  /** UNION ALL across schema versions under the evolved schema. */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    val target = evolvedSchema(dfs.map(_.schema))
    dfs.map { df =>
      val cols: Seq[Column] = target.fields.toSeq.map { f =>
        if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      df.select(cols: _*)
    }.reduce(_.unionAll(_))
  }

  /** Scan-level evolution over parquet paths written with different
    * schemas: one relation, footer-merged schema, pushdown intact. */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
