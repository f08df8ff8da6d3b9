package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Build-vs-probe parity and the partition-pruned probe plan for the
  * persisted BM25 inverted index (q120). */
class InvertedIndexSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private lazy val idxPath = {
    val p = graft.util.Fs.scratchDir("graft-invidx-spec").toString + "/idx"
    InvertedIndex.loadOrBuild(spark, docs, p)
    p
  }

  test("probe is cell-identical to the on-the-fly bm25TopDocs") {
    val terms = Seq("hash", "merge", "vector")
    val direct = TermWeighting.bm25TopDocs(docs, terms, topK = 20)
      .collect().map(_.toSeq).toSeq
    val probed = InvertedIndex.probeBm25(spark, idxPath, terms, topK = 20)
      .collect().map(_.toSeq).toSeq
    assert(probed === direct)
  }

  test("probe plan: postings scan is partition-pruned to the query buckets") {
    val plan = InvertedIndex.probeBm25(spark, idxPath, Seq("hash"), topK = 5)
      .queryExecution.executedPlan.toString
    // static pruning: the bucket IN-list must reach the scan's partition
    // filters, so only 1 of 64 bucket directories is read
    // a 1-element IN folds to equality — accept either form
    assert(plan.matches(
      "(?s).*PartitionFilters: \\[[^\\]]*bucket[^\\]]* (=|IN)[^\\]]*\\].*"),
      s"bucket filter did not reach the partition filters:\n$plan")
    // and the term equality is pushed into the parquet scan
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*term[^\\]]*\\].*"),
      s"term filter not pushed to the postings scan:\n$plan")
  }

  test("single-term probe ranks a strict subset consistent with the full query") {
    val one = InvertedIndex.probeBm25(spark, idxPath, Seq("merge"), topK = 10)
      .collect()
    assert(one.nonEmpty)
    // every returned doc actually contains the term
    val ids = one.map(_.getLong(0)).toSet
    val withTerm = docs
      .filter(org.apache.spark.sql.functions.col("text").contains("merge"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm))
  }
}
