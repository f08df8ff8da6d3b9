package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Differential spec: the distributed BPE trainer must learn the SAME
  * merge rules, in the same order, as a naive in-memory reference
  * trainer on seeded random corpora (same tiebreak: count desc, then
  * (left, right) ascending; same greedy left-to-right merge
  * application). */
class BpeTrainSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Spark compares strings by UTF-8 BYTE order (`UTF8String`'s binary
    * compare); Java `String` ordering is UTF-16 code-unit order, and the
    * two DISAGREE when a supplementary-plane character (encoded as a
    * surrogate pair, 0xD800-0xDFFF) meets a BMP character above U+E000 —
    * UTF-16 sorts the emoji first, UTF-8 sorts it last. The reference
    * tiebreak must compare the way the engine under test does, or the
    * differential claim silently holds only for BMP corpora. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Naive reference: word-frequency dict of char sequences, argmax
    * adjacent pair, greedy left-to-right merge, repeat. */
  private def referenceMerges(texts: Seq[String], n: Int): Seq[(String, String, Long)] = {
    def tok(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    // split into CODE POINTS, not UTF-16 chars: Spark's substring/length
    // operate on code points, so a surrogate pair (😀) is ONE base symbol
    def codePoints(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    var dict: Map[Vector[String], Long] = texts.flatMap(tok)
      .groupBy(identity).map { case (w, ws) => codePoints(w) -> ws.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    val argmaxOrd = new Ordering[((String, String), Long)] {
      def compare(p: ((String, String), Long), q: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(q._2, p._2) // count desc
        if (c != 0) c
        else {
          val l = utf8Compare(p._1._1, q._1._1) // then (left, right) asc,
          if (l != 0) l else utf8Compare(p._1._2, q._1._2) // UTF-8 bytes
        }
      }
    }
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- dict; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      if (counts.nonEmpty) {
        val ((a, b), pc) = counts.toSeq.min(argmaxOrd)
        out += ((a, b, pc))
        def merge(syms: Vector[String]): Vector[String] =
          syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
            else acc :+ s
          }
        dict = dict.groupBy { case (k, _) => merge(k) }
          .map { case (k, vs) => k -> vs.values.sum }
      }
    }
    out.toSeq
  }

  private def check(texts: Seq[String], n: Int): Unit = {
    val got = BpeTrain.learnMerges(texts.zipWithIndex.map(_.swap).toDF("id", "text"), n)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === referenceMerges(texts, n))
  }

  test("learned merges == in-memory reference on seeded random corpora") {
    val rnd = new scala.util.Random(110)
    val vocab = Seq("hash", "join", "scan", "merge", "aggregate", "sort",
      "spill", "shuffle", "batch", "row")
    val texts = (1 to 60).map(_ =>
      (1 to 20).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    check(texts, 12)
  }

  test("overlapping-run semantics: greedy left-to-right, like the reference") {
    // "aaa" under merge (a,a) must become ["aa","a"]; learned order and
    // application both follow the same greedy rule
    check(Seq("aaa aaa aab", "aab aab"), 4)
  }

  test("supplementary-plane tiebreak follows UTF-8 byte order, like Spark") {
    // (😀,😀) and (￠,￠) tie on count. UTF-16 code units sort the
    // emoji first (surrogates 0xD83D < 0xFFE0); UTF-8 bytes sort it last
    // (0xF0 > 0xEF). A reference trainer comparing Java Strings would pick
    // the opposite winner and every later round would diverge.
    check(Seq("😀😀 ￠￠",
              "￠😀 😀￠"), 3)
  }

  test("early exhaustion: single-char words stop the loop without error") {
    val out = BpeTrain.learnMerges(Seq((1L, "a b c a b")).toDF("id", "text"), 5)
      .collect()
    assert(out.isEmpty) // no adjacent pairs exist at all
  }

  test("driver merge loop == distributed merge loop (round-19 finisher)") {
    // same corpora as the differential tests, including the UTF-8
    // tie-break trap, run through BOTH paths by zeroing the vocab cap
    val rnd = new scala.util.Random(119)
    val vocab = Seq("hash", "join", "scan", "merge", "sort", "row")
    val texts = (1 to 40).map(_ =>
      (1 to 15).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq("😀😀 ￠￠", "￠😀 😀￠", "aaa aaa aab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def run(): Seq[(Int, String, String, Long)] =
      BpeTrain.learnMerges(docs, 12).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    val viaDriver = run()
    spark.conf.set("graft.bpe.maxDriverVocab", "0")
    val viaLoop = try run()
      finally spark.conf.unset("graft.bpe.maxDriverVocab")
    assert(viaDriver === viaLoop)
  }

  /** Reference encoder: greedy left-to-right application of rank-ordered
    * rules to each word's code points — the same fold as the reference
    * trainer's merge step. */
  private def referenceEncode(texts: Seq[String],
                              rules: Seq[(String, String)]): Map[Long, (Long, Long, Long)] = {
    def tok(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def codePoints(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    def enc(w: String): Int = rules.foldLeft(codePoints(w)) { case (syms, (a, b)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    }.size
    texts.zipWithIndex.map { case (t, i) =>
      val ws = tok(t)
      (i.toLong, (ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(w => enc(w).toLong).sum))
    }.toMap
  }

  test("encode: per-doc token counts match the in-memory reference encoder") {
    val rnd = new scala.util.Random(121)
    val vocab = Seq("hash", "join", "scan", "merge", "aggregate", "sort",
      "spill", "shuffle", "batch", "row")
    val texts = (1 to 40).map(_ =>
      (1 to 15).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rules = BpeTrain.learnMerges(docs, 12).orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = BpeTrain.encode(docs, rules).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === referenceEncode(texts, rules))
  }

  test("encode: overlapping runs merge greedily (aaa + (a,a) -> 2 tokens)") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = BpeTrain.encode(docs, Seq(("a", "a"))).collect().head
    assert(out.getLong(3) === 2L) // ["aa","a"]
  }

  test("encode: chained rules apply in rank order ((a,b) then (ab,c))") {
    val docs = Seq((1L, "abc abc xbc")).toDF("doc_id", "text")
    val out = BpeTrain.encode(docs, Seq(("a", "b"), ("ab", "c"))).collect().head
    // abc -> [ab,c] -> [abc] = 1 token x2; xbc -> [x,b,c] = 3 tokens
    assert(out.getLong(1) === 3L && out.getLong(3) === 5L)
  }
}
