package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Property pin for the rows-only q80: `graft_deflate_len` semantics and
  * the compression-ratio gate built on it. */
class CompressibilitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("deflate length: deterministic, repetition-sensitive, empty-safe") {
    val rep = "spam ham " * 200                      // highly repetitive
    val varied = (1 to 200).map(i =>                 // same length scale,
      s"w${i * 2654435761L % 9973}").mkString(" ")   // high entropy
    assert(DeflateSize.deflatedLen(rep.getBytes("UTF-8")) ===
      DeflateSize.deflatedLen(rep.getBytes("UTF-8"))) // byte-stable
    val rRep = DeflateSize.deflatedLen(rep.getBytes("UTF-8")).toDouble / rep.length
    val rVar = DeflateSize.deflatedLen(varied.getBytes("UTF-8")).toDouble / varied.length
    assert(rRep < 0.05, s"repetitive ratio $rRep should be tiny")
    assert(rVar > 2 * rRep, s"varied $rVar should compress far worse than $rRep")
    assert(DeflateSize.deflatedLen(Array.emptyByteArray) > 0) // header only
  }

  test("interpreted eval and codegen agree; binary input accepted") {
    DeflateSize.register(spark)
    val docs = Seq((1L, "alpha beta gamma alpha beta"), (2L, "zzzz"))
      .toDF("id", "t")
    // force both paths: a plain projection (whole-stage codegen) vs the
    // same expression evaluated under a non-codegen barrier (sort+filter
    // on the value keeps the expression, collect compares results)
    val gen = docs.selectExpr("id", "graft_deflate_len(t) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val interp = docs.collect().map { r =>
      r.getLong(0) -> DeflateSize.deflatedLen(r.getString(1).getBytes("UTF-8"))
    }.toMap
    assert(gen === interp)
    val bin = Seq(Tuple1("abcabcabc".getBytes("UTF-8"))).toDF("b")
      .selectExpr("graft_deflate_len(b) AS n").head().getInt(0)
    assert(bin === DeflateSize.deflatedLen("abcabcabc".getBytes("UTF-8")))
  }

  test("compressionStats gates repetitive docs, null-ratio on empty") {
    val docs = Seq(
      (1L, ("dup " * 300).trim),               // repetitive → gated
      (2L, (1 to 300).map(i => s"t${i * 7919 % 9973}").mkString(" ")),
      (3L, "")                                  // empty → null ratio, false
    ).toDF("doc_id", "text")
    val out = TextAnalysis.compressionStats(docs)
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(4) === true)
    assert(out(1).getBoolean(4) === false)
    assert(out(2).isNullAt(3) && out(2).getBoolean(4) === false)
    // ratio recomputes from the emitted columns (rounded)
    val r = out(1)
    assert(math.abs(r.getDouble(3) -
      (math.round(r.getLong(2).toDouble / r.getLong(1) * 1e4) / 1e4)) < 1e-9)
  }

  test("q80 runs at sf0.001 with full coverage and sane ratios") {
    val res = graft.Ext3Queries.queries("q80_compressibility")(
      spark, "/root/testdata/sf0.001")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assert(res.count() === docs.count())
    val bad = res.filter(col("n_bytes") > 0 &&
      (col("compress_ratio") <= 0 || col("compress_ratio") > 1.2))
    assert(bad.count() === 0) // deflate can expand slightly, never 20%+
  }
}
