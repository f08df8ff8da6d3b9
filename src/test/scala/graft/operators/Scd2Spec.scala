package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class Scd2Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def collectDim(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getLong(r.fieldIndex("k")),
       r.getString(r.fieldIndex("city")),
       r.getLong(r.fieldIndex("valid_from")),
       if (r.isNullAt(r.fieldIndex("valid_to"))) None else Some(r.getLong(r.fieldIndex("valid_to"))),
       r.getBoolean(r.fieldIndex("is_current")))
    }.toSet

  test("initial load: everything current and open") {
    val v1 = Scd2.apply(None, Seq((1L, "ber"), (2L, "par")).toDF("k", "city"),
      Seq("k"), Seq("city"), version = 1L)
    assert(collectDim(v1) === Set(
      (1L, "ber", 1L, None, true), (2L, "par", 1L, None, true)))
  }

  test("changed rows close and re-open; unchanged rows are a no-op; new keys insert") {
    val v1 = Scd2.apply(None, Seq((1L, "ber"), (2L, "par")).toDF("k", "city"),
      Seq("k"), Seq("city"), 1L)
    val v2 = Scd2.apply(Some(v1),
      Seq((1L, "ber"),          // unchanged → no new version
          (2L, "rom"),          // changed → close v1, open v2
          (3L, "mad")).toDF("k", "city"), // new key
      Seq("k"), Seq("city"), 2L)
    assert(collectDim(v2) === Set(
      (1L, "ber", 1L, None, true),
      (2L, "par", 1L, Some(2L), false),
      (2L, "rom", 2L, None, true),
      (3L, "mad", 2L, None, true)))
  }

  test("a third version chains validity intervals") {
    val v1 = Scd2.apply(None, Seq((1L, "a")).toDF("k", "city"), Seq("k"), Seq("city"), 1L)
    val v2 = Scd2.apply(Some(v1), Seq((1L, "b")).toDF("k", "city"), Seq("k"), Seq("city"), 2L)
    val v3 = Scd2.apply(Some(v2), Seq((1L, "c")).toDF("k", "city"), Seq("k"), Seq("city"), 3L)
    assert(collectDim(v3) === Set(
      (1L, "a", 1L, Some(2L), false),
      (1L, "b", 2L, Some(3L), false),
      (1L, "c", 3L, None, true)))
  }

  test("null attributes compare null-safely (null == null is unchanged)") {
    val v1 = Scd2.apply(None,
      Seq((1L, Option.empty[String])).toDF("k", "city"), Seq("k"), Seq("city"), 1L)
    val v2 = Scd2.apply(Some(v1),
      Seq((1L, Option.empty[String])).toDF("k", "city"), Seq("k"), Seq("city"), 2L)
    assert(v2.count() === 1) // no spurious new version
    val v3 = Scd2.apply(Some(v2),
      Seq((1L, Some("x"))).toDF("k", "city"), Seq("k"), Seq("city"), 3L)
    assert(v3.count() === 2) // null → 'x' IS a change
  }

  test("duplicate batch keys collapse deterministically — never two open versions") {
    val v1 = Scd2.apply(None,
      Seq((1L, "zzz"), (1L, "aaa")).toDF("k", "city"), // dup key
      Seq("k"), Seq("city"), 1L,
      batchPriority = Some(Seq(org.apache.spark.sql.functions.col("city").asc)))
    assert(collectDim(v1) === Set((1L, "aaa", 1L, None, true)))
    assert(v1.filter(org.apache.spark.sql.functions.col("is_current")).count() === 1)
  }

  test("null keys match null-safely — never two open versions for the null key") {
    val v1 = Scd2.apply(None,
      Seq((Option.empty[java.lang.Long], "a"), (Some(1L): Option[java.lang.Long], "b"))
        .toDF("k", "city"),
      Seq("k"), Seq("city"), 1L)
    // unchanged null-keyed row: must be a no-op, not a duplicate insert
    val v2 = Scd2.apply(Some(v1),
      Seq((Option.empty[java.lang.Long], "a")).toDF("k", "city"),
      Seq("k"), Seq("city"), 2L)
    assert(v2.count() === 2)
    assert(v2.filter(org.apache.spark.sql.functions.col("is_current")).count() === 2)
    // changed null-keyed row: close the old version, open exactly one new
    val v3 = Scd2.apply(Some(v2),
      Seq((Option.empty[java.lang.Long], "z")).toDF("k", "city"),
      Seq("k"), Seq("city"), 3L)
    val open = v3.filter(org.apache.spark.sql.functions.col("is_current") &&
      org.apache.spark.sql.functions.col("k").isNull).collect()
    assert(open.length === 1)
    assert(open.head.getString(open.head.fieldIndex("city")) === "z")
    assert(v3.count() === 3) // a, closed; z, open; b, open
  }

  test("keys absent from the batch stay current untouched") {
    val v1 = Scd2.apply(None, Seq((1L, "a"), (2L, "b")).toDF("k", "city"),
      Seq("k"), Seq("city"), 1L)
    val v2 = Scd2.apply(Some(v1), Seq((1L, "z")).toDF("k", "city"),
      Seq("k"), Seq("city"), 2L)
    assert(collectDim(v2) === Set(
      (1L, "a", 1L, Some(2L), false),
      (1L, "z", 2L, None, true),
      (2L, "b", 1L, None, true)))
  }
}
