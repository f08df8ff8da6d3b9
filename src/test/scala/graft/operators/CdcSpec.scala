package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Snapshot-diff CDC generation (q81 hash-checks the full pipeline against
  * DuckDB; these specs pin the semantics the oracle can't isolate: op
  * classification, delete-side value provenance, null-safe key and value
  * matching, schema guards). */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def collectOps(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val newSnap = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id"))
    assert(out.columns.toSeq === Seq("op", "id", "v"))
    assert(collectOps(out) === Set(
      ("U", Some(2L), Some("B")), // new value wins on update
      ("D", Some(3L), Some("c")), // delete carries the OLD values
      ("I", Some(4L), Some("d"))))
  }

  test("snapshotDiff matches null keys null-safely and compares values null-safely") {
    val oldSnap = Seq((Option(1L), Option("x")), (Option.empty[Long], Option("n")),
      (Option(2L), Option.empty[String])).toDF("id", "v")
    val newSnap = Seq((Option(1L), Option.empty[String]), (Option.empty[Long], Option("n")),
      (Option(2L), Option.empty[String])).toDF("id", "v")
    val out = collectOps(Cdc.snapshotDiff(oldSnap, newSnap, Seq("id")))
    // null-keyed row pairs with its null-keyed twin (unchanged, no I+D);
    // value x→null is an update; null→null is unchanged
    assert(out === Set(("U", Some(1L), None)))
  }

  test("snapshotDiff with key-only schema emits only inserts and deletes") {
    val out = Cdc.snapshotDiff(
      Seq(Tuple1(1L), Tuple1(2L)).toDF("id"),
      Seq(Tuple1(2L), Tuple1(3L)).toDF("id"), Seq("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // no value columns → a matched key can never be an update
    assert(out === Set(("D", 1L), ("I", 3L)))
  }

  test("applyDiff round-trip: old + snapshotDiff(old,new) == new") {
    val oldS = Seq((Option(1L), Option("a")), (Option(2L), Option("b")),
      (Option(3L), Option("c")), (Option.empty[Long], Option("n"))).toDF("id", "v")
    val newS = Seq((Option(1L), Option("a")), (Option(2L), Option.empty[String]),
      (Option(4L), Option("d")), (Option.empty[Long], Option("N"))).toDF("id", "v")
    val diff = Cdc.snapshotDiff(oldS, newS, Seq("id"))
    val applied = Cdc.applyDiff(oldS, diff, Seq("id"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    val want = newS.collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(applied === want) // faithful replication incl. null key + null values
  }

  test("snapshotDiff rejects mismatched schemas and op-column collisions") {
    val a = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(a, Seq((1L, "x")).toDF("id", "w"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(a, a, Seq("id"), opCol = "v")
    }
  }
}
