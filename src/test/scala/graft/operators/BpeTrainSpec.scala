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

  /** Naive reference: word-frequency dict of char sequences, argmax
    * adjacent pair, greedy left-to-right merge, repeat. */
  private def referenceMerges(texts: Seq[String], n: Int): Seq[(String, String, Long)] = {
    def tok(t: String) = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    var dict: Map[Vector[String], Long] = texts.flatMap(tok)
      .groupBy(identity).map { case (w, ws) => w.map(_.toString).toVector -> ws.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- dict; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      if (counts.nonEmpty) {
        val ((a, b), pc) = counts.minBy { case ((x, y), c) => (-c, x, y) }
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

  test("early exhaustion: single-char words stop the loop without error") {
    val out = BpeTrain.learnMerges(Seq((1L, "a b c a b")).toDF("id", "text"), 5)
      .collect()
    assert(out.isEmpty) // no adjacent pairs exist at all
  }
}
