package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The scale-safe broadcast-table encoder's load-bearing claim is
  * SCHEDULER EQUIVALENCE: rank-priority greedy merging (merge the
  * lowest-rank adjacent pair, leftmost on ties, until none remains) must
  * produce exactly the token sequence of sequential rule application
  * (each rule greedy left-to-right over the whole word, in rank order —
  * the fold semantics BpeTrain/BpeEncodeLen implement and the DuckDB
  * oracles replay). Pinned here on randomized merge tables over
  * adversarial small alphabets (overlap-heavy), plus full-frame parity
  * with [[BpeTrain.encode]] on learned rules, and the table builder's
  * own invariants. */
class BpeCodecSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Sequential reference: apply rules in rank order, each greedy
    * left-to-right comparing the last WRITTEN symbol — the exact fold of
    * BpeTrainSpec.referenceEncode, kept symbol-level here so arrays (not
    * just lengths) can be compared. */
  private def sequentialEncode(word: String,
                               rules: Seq[(String, String)]): Vector[String] = {
    def codePoints(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    rules.foldLeft(codePoints(word)) { case (syms, (a, b)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    }
  }

  test("rank-priority == sequential on randomized overlap-heavy tables") {
    val rnd = new scala.util.Random(129)
    for (trial <- 1 to 200) {
      // grow a merge table the way real vocabularies grow: each rule pairs
      // two symbols already producible (chars or earlier merges), so deep
      // chains and same-symbol overlaps both occur
      val alphabet = Vector("a", "b", "c")
      var producible = alphabet
      val rules = scala.collection.mutable.ArrayBuffer[(String, String)]()
      val seen = scala.collection.mutable.Set[(String, String)]()
      for (_ <- 1 to 2 + rnd.nextInt(10)) {
        val p = (producible(rnd.nextInt(producible.size)),
          producible(rnd.nextInt(producible.size)))
        if (!seen.contains(p)) {
          seen += p
          rules += p
          producible = producible :+ (p._1 + p._2)
        }
      }
      val table = BpeCodec.rankTable(rules.toSeq)
      for (_ <- 1 to 20) {
        val w = (1 to 1 + rnd.nextInt(12))
          .map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
        val got = BpeCodec.greedyEncode(w, table).toVector
        val want = sequentialEncode(w, rules.toSeq)
        assert(got === want,
          s"trial $trial word '$w' rules ${rules.toList}: $got vs $want")
      }
    }
  }

  test("supplementary-plane symbols stay single code points") {
    val rules = Seq(("😀", "￠"))
    val got = BpeCodec.greedyEncode("😀￠😀", BpeCodec.rankTable(rules)).toVector
    assert(got === Vector("😀￠", "😀"))
  }

  test("overlapping run merges greedily: aaa + (a,a) -> [aa, a]") {
    val got = BpeCodec.greedyEncode("aaa",
      BpeCodec.rankTable(Seq(("a", "a")))).toVector
    assert(got === Vector("aa", "a"))
  }

  test("encode == BpeTrain.encode cell-for-cell under learned rules") {
    val rnd = new scala.util.Random(130)
    val vocab = Seq("hash", "join", "scan", "merge", "aggregate", "sort",
      "spill", "shuffle", "batch", "row")
    val docs = (1 to 40).map(i => (i.toLong,
      (1 to 15).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val rules = BpeTrain.learnMerges(docs, 12).orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val a = BpeCodec.encode(docs, rules).orderBy("doc_id").collect().map(_.toSeq)
    val b = BpeTrain.encode(docs, rules).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("driver-finished codec build == distributed, table and stats cell-for-cell") {
    // the q129/q130 round-20 finisher: same merge table, same vocab map,
    // same stats frame whether the build ran on the driver (collected
    // dict rows) or through the distributed argmax collects
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dict = BpeCodec.wordCounts(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rows = dict.as[(String, Long)].collect()
      for ((perLevel, levels) <- Seq((20, 2), (2, 1))) {
        val tDriver = BpeCodec.frequencyMergeTableFromRows(rows, perLevel, levels)
        val tDist = BpeCodec.frequencyMergeTableFromDict(dict, perLevel, levels)
        assert(tDriver === tDist, s"table mismatch at ($perLevel, $levels)")
        val sDriver = BpeCodec.encodeStatsFromVocabMap(docs,
            BpeCodec.encodedLengthsFromRows(rows, tDriver))
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        val sDist = BpeCodec.encodeStatsFromDocs(docs, dict, tDist)
          .orderBy("doc_id").collect().map(_.toSeq).toSeq
        assert(sDriver === sDist, s"stats mismatch at ($perLevel, $levels)")
      }
    } finally { dict.unpersist(): Unit }
  }

  test("frequencyMergeTable: deterministic, duplicate-free, level 2 merges merges") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val t1 = BpeCodec.frequencyMergeTable(docs, perLevel = 20, levels = 2)
    val t2 = BpeCodec.frequencyMergeTable(docs, perLevel = 20, levels = 2)
    assert(t1 === t2)
    assert(t1.distinct.size === t1.size, "duplicate pair in table")
    assert(t1.size === 40)
    // level 1 is code-point pairs; level 2 must pair at least one symbol
    // produced by level 1 (a multi-code-point side)
    assert(t1.drop(20).exists { case (a, b) =>
      a.codePointCount(0, a.length) > 1 || b.codePointCount(0, b.length) > 1
    }, s"level 2 never merged a merged symbol: ${t1.drop(20)}")
    // first rule == the trainer's first learned merge (same weighted argmax)
    val m1 = BpeTrain.learnMerges(docs, 1).collect().head
    assert(t1.head === ((m1.getString(1), m1.getString(2))))
  }

  test("table pairs never survive adjacent in their own encode output") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val table = BpeCodec.frequencyMergeTable(docs, perLevel = 10, levels = 2)
    val rk = BpeCodec.rankTable(table)
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.filter(
          graft.functions.TextFunctions.tokens(
            org.apache.spark.sql.functions.col("text")),
          x => x =!= org.apache.spark.sql.functions.lit(""))).as("w"))
      .distinct().limit(500).as[String].collect()
    words.foreach { w =>
      val syms = BpeCodec.greedyEncode(w, rk)
      syms.sliding(2).filter(_.length == 2).foreach { p =>
        // NUL-separator key, kept as an escape rather than a raw byte
        // (a literal NUL makes the file binary to git)
        assert(!rk.containsKey(p(0) + "\u0000" + p(1)),
          s"'$w': pair (${p(0)},${p(1)}) in table but left unmerged")
      }
    }
  }

  test("encodeStatsFromDocs == encodeFromTf cell-for-cell (incl. empty doc)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .union(Seq((100000L, "", "en", "synthetic", 0L),
        (100001L, "   ", "en", "synthetic", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val table = BpeCodec.frequencyMergeTable(docs, perLevel = 5, levels = 2)
    val dict = BpeCodec.wordCounts(docs)
    val tf = BpeCodec.termFrequencies(docs)
    val flat = BpeCodec.encodeFromTf(tf, table)
      .orderBy("doc_id").collect().map(_.toSeq)
    val fused = BpeCodec.encodeStatsFromDocs(docs, dict, table)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(fused.length > 0)
    assert(fused.toSeq === flat.toSeq)
    // schema parity too — the oracle compare sorts columns by name
    assert(BpeCodec.encodeStatsFromDocs(docs, dict, table)
      .schema.map(f => (f.name, f.dataType)) ===
      BpeCodec.encodeFromTf(tf, table).schema.map(f => (f.name, f.dataType)))
  }

  test("wordCounts == RLE-derived dict cell-for-cell") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = BpeCodec.wordCounts(docs)
      .orderBy("w").collect().map(_.toSeq)
    val b = BpeCodec.termFrequencies(docs)
      .groupBy("w").agg(org.apache.spark.sql.functions.sum("tf").as("cnt"))
      .orderBy("w").collect().map(_.toSeq)
    assert(a.length > 0)
    assert(a.toSeq === b.toSeq)
  }
}
