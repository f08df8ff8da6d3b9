package graft.operators

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SchemaEvolutionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("evolvedSchema: first-seen order, widening, nullability from absence") {
    val v1 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", StringType, nullable = false)))
    val v2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false)))
    val out = SchemaEvolution.evolvedSchema(Seq(v1, v2))
    assert(out.fieldNames.toSeq === Seq("id", "v", "score"))
    assert(out("id").dataType === LongType)        // widened int→long
    assert(!out("id").nullable)                    // present everywhere
    assert(out("score").nullable)                  // absent from v1
  }

  test("widen: numeric ladder works, incompatible types throw") {
    assert(SchemaEvolution.widen(IntegerType, DoubleType) === DoubleType)
    assert(SchemaEvolution.widen(ByteType, ShortType) === ShortType)
    // long+float → float: SQL/Java numeric promotion (documented tradeoff)
    assert(SchemaEvolution.widen(FloatType, LongType) === FloatType)
    intercept[IllegalArgumentException] {
      SchemaEvolution.widen(StringType, IntegerType)
    }
  }

  test("widen: decimal precision/scale growth is lossless") {
    assert(SchemaEvolution.widen(DecimalType(10, 2), DecimalType(12, 2)) ===
      DecimalType(12, 2))
    assert(SchemaEvolution.widen(DecimalType(10, 2), DecimalType(10, 4)) ===
      DecimalType(12, 4)) // 8 integral digits + 4 scale
  }

  test("column names fold case-insensitively like Spark's default resolution") {
    // 'Price' (int) + 'price' (long) is ONE widened column under the
    // first-seen casing, not two distinct columns
    val v1 = StructType(Seq(StructField("Price", IntegerType, nullable = false)))
    val v2 = StructType(Seq(StructField("price", LongType, nullable = false)))
    val out = SchemaEvolution.evolvedSchema(Seq(v1, v2))
    assert(out.fieldNames.toSeq === Seq("Price"))
    assert(out("Price").dataType === LongType)
    assert(!out("Price").nullable) // present (under some casing) everywhere

    val d1 = Seq(1).toDF("Price")
    val d2 = Seq(2L).toDF("price")
    val u = SchemaEvolution.unionEvolved(Seq(d1, d2))
    assert(u.columns.toSeq === Seq("Price"))
    assert(u.collect().map(_.getLong(0)).toSet === Set(1L, 2L))

    // caseSensitive=true keeps them distinct (each absent from the other)
    val strict = SchemaEvolution.evolvedSchema(Seq(v1, v2), caseSensitive = true)
    assert(strict.fieldNames.toSet === Set("Price", "price"))
    assert(strict.fields.forall(_.nullable))
  }

  test("unionEvolved: rows from every version under the evolved schema") {
    val v1 = Seq((1, "a"), (2, "b")).toDF("id", "v") // int ids, no score
    val v2 = Seq((3L, "c", 0.5)).toDF("id", "v", "score")
    val out = SchemaEvolution.unionEvolved(Seq(v1, v2))
    assert(out.schema("id").dataType === LongType)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(rows === Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))
  }

  test("readEvolved: parquet mergeSchema across two file generations") {
    val dir = tempDir("evolve")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/gen=1")
    Seq((2L, "b", 0.9)).toDF("id", "v", "score").write.parquet(s"$dir/gen=2")
    val out = SchemaEvolution.readEvolved(spark, s"$dir/gen=1", s"$dir/gen=2")
    assert(out.columns.toSet === Set("id", "v", "score"))
    val byId = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(out.columns.indexOf("score"))) None
       else Some(r.getDouble(out.columns.indexOf("score"))))).toMap
    assert(byId === Map(1L -> None, 2L -> Some(0.9)))
  }
}
