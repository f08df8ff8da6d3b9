package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Curation funnel: the restated per-row flag formulas must agree with
  * the operators they compose (langId / gopherRules / exactGroups), and
  * the funnel arithmetic must be cumulative and dedup-correct. */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("stage flags agree with langId and gopherRules on real data") {
    val flags = Curation.stageFlags(docs)
      .select("doc_id", "predicted_lang", "gopher_keep").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    val lang = TextAnalysis.langId(docs)
      .select("doc_id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gopher = TextAnalysis.gopherRules(docs)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags.keySet === lang.keySet)
    flags.foreach { case (id, (pl, gk)) =>
      assert(pl === lang(id), s"doc $id predicted_lang drifted")
      assert(gk === gopher(id), s"doc $id gopher keep drifted")
    }
  }

  test("funnel is cumulative and respects exact-dedup canonicality") {
    import spark.implicits._
    val raw = Seq(
      // two exact dups (after ws-normalization) that pass both gates: only
      // the min id survives
      (1L, ("the and that have with be to of " * 8).trim, "en", "web"),
      // same text with an internal double space: identical after
      // whitespace normalization, so an exact dup of doc 1
      (2L, ("the and that have with be to of " * 8).trim.replaceFirst(" ", "  "), "en", "web"),
      // passes gates, unique: kept
      (3L, ("the and of to be that have with more words here " * 6).trim, "en", "web"),
      // declared de but en-looking text: fails the lang gate
      (4L, ("the and that have with be to of " * 8).trim, "de", "web"),
      // too short: passes lang, fails gopher
      (5L, "the and that have with", "en", "news"),
      // duplicate of 1 but lang-gate-failed: must NOT claim canonicality
      (6L, ("the and that have with be to of " * 8).trim, "fr", "news")
    ).toDF("doc_id", "text", "lang", "source")
    val rep = Curation.pipeline(raw).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // web: 4 in; doc4 fails lang (3 pass); 1,2,3 pass gopher; dedup keeps 1,3
    assert(rep("web")._1 === 4L)
    assert(rep("web")._2 === 3L)
    assert(rep("web")._3 === 3L)
    assert(rep("web")._4 === 2L)
    // news: 2 in; doc6 fails lang, doc5 passes lang but fails gopher
    assert(rep("news") === ((2L, 1L, 0L, 0L, 0L)))
    // words_kept counts only final survivors
    assert(rep("web")._5 > 0L)
  }

  test("funnel counts are monotone non-increasing on real data") {
    Curation.pipeline(docs).collect().foreach { r =>
      val (n0, n1, n2, n3) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n0 >= n1 && n1 >= n2 && n2 >= n3,
        s"${r.getString(0)}: funnel not monotone ($n0, $n1, $n2, $n3)")
    }
  }
}
