package graft.operators

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TermWeightingSpec extends AnyFunSuite with SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docs = df(schema, Seq(
    Seq(1L, "apple banana apple"),
    Seq(2L, "banana cherry"),
    Seq(3L, "cherry cherry cherry"),
    Seq(4L, "   "))) // whitespace-only doc: contributes N but no terms

  test("tfidf: hand-computed scores, rounded-rank ordering") {
    val out = TermWeighting.tfidfTopTerms(docs, topK = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .sortBy(t => (t._1, t._5))
    // N = 4 docs. df: apple 1, banana 2, cherry 2.
    def s(tf: Long, dfc: Long) =
      BigDecimal(tf * math.log(4.0 / dfc)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Array(
      (1L, "apple", 2L, s(2, 1), 1L),   // 2*ln(4)   = 2.7726
      (1L, "banana", 1L, s(1, 2), 2L),  // 1*ln(2)   = 0.6931
      (2L, "banana", 1L, s(1, 2), 1L),  // ties by term: banana < cherry
      (2L, "cherry", 1L, s(1, 2), 2L),
      (3L, "cherry", 3L, s(3, 2), 1L)))
  }

  test("tfidf: topK truncates per document") {
    val out = TermWeighting.tfidfTopTerms(docs, topK = 1)
    assert(out.groupBy("doc_id").count().collect().forall(_.getLong(1) == 1L))
    // doc 1's single kept term is its highest-scoring one
    assert(out.filter("doc_id = 1").head().getString(1) === "apple")
  }

  test("tfidf: broadcast-vocab and windowed-df variants agree exactly") {
    val a = TermWeighting.tfidfTopTerms(docs, topK = 5, broadcastVocab = true)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = TermWeighting.tfidfTopTerms(docs, topK = 5, broadcastVocab = false)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a === b)
  }

  test("heavy hitters: exact counts, count-desc term-asc order, k cap") {
    val out = TermWeighting.heavyHitters(docs, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // counts: cherry 4, apple 2, banana 2 → top-2 = cherry, then apple (tie
    // between apple/banana broken by term)
    assert(out === Array(("cherry", 4L), ("apple", 2L)))
  }
}
