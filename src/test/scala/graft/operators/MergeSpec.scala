package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import Merge.{MatchedDelete, MatchedUpdate, NotMatchedInsert}

class MergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def baseDf = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "v", "x")

  test("merge: update + delete + insert clauses, first-match-wins order") {
    val source = Seq(
      (2L, "B", 99.0),   // matched, x<100 → update
      (3L, "C", 500.0),  // matched, x>=100 → delete (clause listed first)
      (5L, "e", 50.0)    // unmatched → insert
    ).toDF("k", "v", "x")

    val out = Merge.merge(baseDf, source, Seq("k"),
      matched = Seq(
        MatchedDelete(Some(Merge.src("x") >= 100.0)),
        MatchedUpdate(Map("v" -> Merge.src("v"), "x" -> Merge.src("x")))),
      notMatched = Some(NotMatchedInsert()),
      sourcePriority = Seq(col("k"))
    ).collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap

    assert(out === Map(
      1L -> ("a", 10.0),   // untouched base row
      2L -> ("B", 99.0),   // updated
      4L -> ("d", 40.0),   // untouched base row
      5L -> ("e", 50.0)))  // inserted; 3L deleted
  }

  test("merge: matched row matching no clause is kept; conditional insert") {
    val source = Seq((1L, "A", 5.0), (6L, "f", 60.0), (7L, "g", 999.0))
      .toDF("k", "v", "x")
    val out = Merge.merge(baseDf, source, Seq("k"),
      matched = Seq(MatchedUpdate(Map("v" -> Merge.src("v")),
        condition = Some(Merge.src("x") > 100.0))), // 1L fails the condition
      notMatched = Some(NotMatchedInsert(condition = Some(Merge.src("x") < 100.0))),
      sourcePriority = Seq(col("k"))
    ).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1L kept as-is, 6L inserted, 7L dropped by the insert condition
    assert(out === Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 6L -> "f"))
  }

  test("merge: update SET may mix base and source values") {
    val source = Seq((2L, "ignored", 7.0)).toDF("k", "v", "x")
    val out = Merge.merge(baseDf, source, Seq("k"),
      matched = Seq(MatchedUpdate(Map(
        "x" -> (Merge.base("x") + Merge.src("x"))))), // v keeps base value
      notMatched = None,
      sourcePriority = Seq(col("k"))
    ).collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap
    assert(out(2L) === ("b", 27.0))
    assert(out(1L) === ("a", 10.0))
  }

  test("merge: duplicate source keys collapse by priority before merging") {
    val source = Seq((2L, "first", 1.0), (2L, "second", 2.0)).toDF("k", "v", "x")
    val out = Merge.merge(baseDf, source, Seq("k"),
      matched = Seq(MatchedUpdate(Map("v" -> Merge.src("v")))),
      notMatched = None,
      sourcePriority = Seq(col("x").asc)
    ).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) === "first")
  }

  test("merge: null keys match null-safely instead of always inserting") {
    val base = Seq((Option(1L), "a", 1.0), (Option.empty[Long], "n", 2.0))
      .toDF("k", "v", "x")
    val source = Seq((Option.empty[Long], "N2", 9.0)).toDF("k", "v", "x")
    val out = Merge.merge(base, source, Seq("k"),
      matched = Seq(MatchedUpdate(Map("v" -> Merge.src("v")))),
      notMatched = Some(NotMatchedInsert()),
      sourcePriority = Seq(col("v"))
    ).collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getString(1)).toMap
    // the null-key source row UPDATES the null-key base row (one row out)
    assert(out === Map(Some(1L) -> "a", None -> "N2"))
  }

  test("replay-guarded additive clauses: stale partials are per-key no-ops") {
    val table = Seq((1L, 2L, 10.0, 7L), (2L, 1L, 5.0, 6L))
      .toDF("k", "n_events", "total", "__graft_last_batch")
    val partial = Seq((1L, 1L, 4.0, 7L), (2L, 1L, 3.0, 7L))
      .toDF("k", "n_events", "total", "__graft_last_batch")
    val (matched, notMatched) =
      IncrementalAgg.mergeClauses(Seq("total"), replayGuard = Some("__graft_last_batch"))
    val out = Merge.merge(table, partial, Seq("k"), matched, notMatched, Seq(col("k")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // k=1 already at batch 7 → untouched; k=2 at 6 → folds and advances
    assert(out === Map(
      1L -> ((2L, 10.0, 7L)),
      2L -> ((2L, 8.0, 7L))))
  }

  test("mergePartitionedTable: bucket-pruned merge, idempotent re-run") {
    val path = tempDir("merge-part") + "/t"
    val base = (1L to 100L).map(i => (i, s"v$i", i.toDouble)).toDF("k", "v", "x")
    Upsert.upsertPartitionedTable(spark, path, base, Seq("k"), Seq(col("k")), numBuckets = 8)

    val source = Seq(
      (10L, "TEN", 1.0),     // update
      (20L, "del", 9999.0),  // delete
      (200L, "new", 2.0)     // insert
    ).toDF("k", "v", "x")
    // The insert clause must exclude delete tombstones, otherwise a REPLAY
    // of the batch re-inserts the row it deleted (the key no longer
    // matches) — the standard CDC-merge guard.
    def runOnce(): Unit = Merge.mergePartitionedTable(spark, path, source, Seq("k"),
      matched = Seq(
        MatchedDelete(Some(Merge.src("x") >= 1000.0)),
        MatchedUpdate(Map("v" -> Merge.src("v")))),
      notMatched = Some(NotMatchedInsert(condition = Some(Merge.src("x") < 1000.0))),
      sourcePriority = Seq(col("k")))

    runOnce()
    val out1 = Upsert.readPartitionedTable(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out1.size === 100) // 100 - 1 delete + 1 insert
    assert(out1(10L) === "TEN")
    assert(!out1.contains(20L))
    assert(out1(200L) === "new")
    assert(out1(50L) === "v50") // untouched row intact

    runOnce() // idempotent: 20L already gone, 10L/200L re-apply to same values
    val out2 = Upsert.readPartitionedTable(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out2 === out1)
  }

  test("mergePartitionedTable: untouched bucket files are not rewritten") {
    val path = tempDir("merge-prune") + "/t"
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.upsertPartitionedTable(spark, path, base, Seq("k"), Seq(col("k")), numBuckets = 8)
    val conf = spark.sparkContext.hadoopConfiguration
    val before = (0 until 8).map(b =>
      b -> graft.util.Fs.fingerprint(s"$path/${Upsert.BucketCol}=$b", conf)).toMap

    val source = Seq((10L, "TEN")).toDF("k", "v")
    Merge.mergePartitionedTable(spark, path, source, Seq("k"),
      matched = Seq(MatchedUpdate(Map("v" -> Merge.src("v")))),
      notMatched = None, sourcePriority = Seq(col("k")))

    val touched = Math.floorMod(
      org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(10L, 42), 8)
    val after = (0 until 8).map(b =>
      b -> graft.util.Fs.fingerprint(s"$path/${Upsert.BucketCol}=$b", conf)).toMap
    assert(after(touched) !== before(touched))
    assert((0 until 8).filter(_ != touched).forall(b => after(b) === before(b)))
  }
}
