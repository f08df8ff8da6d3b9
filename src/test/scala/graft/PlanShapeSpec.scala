package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-8 performance rewrites — the
  * measured wins live or die on these physical-plan properties, so they
  * are pinned here against optimizer-interaction regressions (the same
  * discipline as BloomJoinSpec's filter-below-exchange assert).
  * Parquet-backed inputs (sf0.001) keep ConvertToLocalRelation from
  * collapsing the nodes under test. */
class PlanShapeSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q22 plan: two shuffles, cache barrier present, no inlined shingle filter") {
    val plan = SparkEntry.queries("q22_ngram_jaccard_pairs")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // exactly two hash-partitioned exchanges: bucket groupBy + pair groupBy
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 2, s"expected 2 shuffles, got $shuffles in:\n$plan")
    // the doc-level persist is the optimizer barrier keeping
    // InferFiltersFromGenerate's size() filter OFF the tokenize chain
    assert(plan.contains("InMemoryTableScan"),
      "doc-level cache barrier missing — the inferred generator filter " +
        "will inline the tokenize+shingle chain into a scan filter (19s " +
        "vs 2.2s at sf0.1)")
    // the 19s failure mode: a Filter whose condition re-evaluates the
    // shingle lambda (split inside element_at) per row
    assert(!plan.matches("(?s).*Filter [^\\n]*element_at\\(split.*"),
      s"inlined tokenize chain found in a Filter condition:\n$plan")
  }

  test("q48 plan: blocked range join is one shuffled hash join, no sorts") {
    val plan = SparkEntry.queries("q48_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the (key, bucket) equi keys make it a hash join; sort-merge would
    // sort 3x the input rows for a pair set orders of magnitude smaller
    // (measured 4.0s -> 1.2s at sf1)
    assert(plan.contains("ShuffledHashJoin"),
      s"range join must be a shuffled hash join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge crept back:\n$plan")
    // one exchange per side, nothing else
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 2, s"expected 2 exchanges (one per side), got $shuffles in:\n$plan")
  }

  test("q98 plan: ADC shortlist broadcasts into the re-rank join — no shuffle join") {
    val plan = SparkEntry.queries("q98_pq_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"re-rank join must broadcast the shortlist:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"shuffle join in the re-rank path:\n$plan")
  }

  test("q100 plan: three shuffles — gram buckets, one doc_id exchange " +
    "shared by both windows and both aggregations, final order") {
    val plan = SparkEntry.queries("q100_dup_spans")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashShuffles === 2,
      s"expected 2 hash exchanges (gram buckets + doc_id), got $hashShuffles in:\n$plan")
    // the (doc_id, island) and (doc_id) groupings must ride the window's
    // doc_id partitioning — a third hash exchange means that broke
    val range = "Exchange rangepartitioning".r.findAllIn(plan).size
    assert(range === 1, s"expected 1 range exchange (final orderBy), got $range in:\n$plan")
    // the InferFiltersFromGenerate landmine: no tokenize chain inlined as
    // a per-row scan filter (the generator child is a computed expression,
    // which keeps the rule off — pin that)
    assert(!plan.matches("(?s).*Filter [^\\n]*split\\(.*"),
      s"inlined tokenize chain found in a Filter condition:\n$plan")
  }

  test("q02 star join: pre-agg below the joins, dims broadcast, no distinct Expand") {
    val plan = SparkEntry.queries("q02_revenue_by_nation")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      s"fact-dim join fell back to a shuffle join:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull"),
      s"no pushed filters on the scan:\n$plan")
    // round-14 shape: lineitem revenue is pre-aggregated per l_orderkey
    // BELOW the star join (map-side partial agg on the scan), so the final
    // agg is a plain count(*)+sum — no countDistinct shuffle over the fanout.
    assert("HashAggregate\\(keys=\\[l_orderkey".r.findFirstIn(plan).isDefined,
      s"per-order pre-aggregate missing below the joins:\n$plan")
    assert(!plan.contains("Expand") && !plan.contains("distinct"),
      s"distinct aggregation crept back over the join fanout:\n$plan")
    val preAggAt = plan.indexOf("HashAggregate(keys=[l_orderkey")
    val joinAt = plan.indexOf("BroadcastHashJoin")
    assert(joinAt >= 0 && preAggAt > joinAt,
      s"pre-agg must sit below the joins (parents print first):\n$plan")
  }

  test("q02 bucketed layout: pre-agg and orders join ride the bucket " +
    "partitioning — only the final group agg exchanges") {
    // broadcast disabled EXCEPT the explicit dim hints (broadcast() wins
    // over the threshold), so the perOrder ⋈ orders join must expose its
    // distribution requirement: co-located buckets ⇒ zero join exchanges.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val plan = SparkEntry.queries("q02_revenue_by_nation")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"bucketed table scan missing — layout not in effect:\n$plan")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles === 1,
        s"expected exactly 1 hash exchange (the final 25-group agg), " +
          s"got $shuffles in:\n$plan")
    } finally spark.conf.set(key, saved)
  }

  test("q103 plan: model tables broadcast, top-k as heaps — no global window/sort") {
    val plan = SparkEntry.queries("q103_bm25_rank")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // df + corpus-stats join back by broadcast, never a shuffle join
    assert(plan.contains("BroadcastHashJoin"), s"df join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"shuffle join in the score path:\n$plan")
    // the top-k is TakeOrderedAndProject (per-partition heaps); the rank
    // window must sit ABOVE it (≤ topK rows), never below over the full
    // scored set (parents print before children in the tree string)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps:\n$plan")
    // guard against a vacuous pass: indexOf == -1 would satisfy the
    // ordering check if the window disappeared from the plan entirely
    assert(plan.contains("Window"), s"rank window missing from plan:\n$plan")
    assert(plan.indexOf("Window") < plan.indexOf("TakeOrderedAndProject"),
      s"rank window ran below the top-k, over the full scored set:\n$plan")
    assert(!plan.matches("(?s).*Filter [^\\n]*split\\(.*"),
      s"inlined tokenize chain found in a Filter condition:\n$plan")
  }

  test("q105 plan: vocabulary broadcasts, no tokenizer inlined into a Filter") {
    val plan = SparkEntry.queries("q105_bigram_logloss")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model-count joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"shuffle join in the scoring path:\n$plan")
    // the short-doc guard lives INSIDE the bigram generator — no Filter
    // may carry the re-inlined tokenize chain (the q22/q100 landmine)
    assert(!plan.matches("(?s).*Filter [^\\n]*split\\(.*"),
      s"inlined tokenize chain found in a Filter condition:\n$plan")
  }

  test("q117 plan: broadcast-assign is shuffle-free and join-free") {
    val plan = SparkEntry.queries("q117_kmeans_assign")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the whole assignment is scan → project (kernel + dist fold): the
    // centroid matrix rides inside codegen, never as a join side
    assert(!plan.contains("Exchange"),
      s"assignment pass must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"assignment pass must not join:\n$plan")
    assert(plan.contains("graft_nearest_centroid"),
      s"NearestCentroid kernel missing from the plan:\n$plan")
  }

  test("q115 plan: unigram model broadcasts, top-k as heaps — no global sort") {
    val plan = SparkEntry.queries("q115_pmi_collocations")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"unigram-count joins must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"shuffle join in the scoring path:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heaps, not a global sort:\n$plan")
  }

  test("q133 plan: single-distinct stays on hash aggregation — no Expand, " +
    "no SortAggregate") {
    val plan = SparkEntry.queries("q133_distinct_ngrams")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one countDistinct + one plain count must rewrite to the two-level
    // hash aggregate; a second distinct column (or a var-length min/max)
    // would trigger the Expand + SortAggregate trap (45M gram rows at sf1
    // would then sort instead of hash)
    assert(!plan.contains("Expand"), s"Expand in the distinct path:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"aggregation fell off hash aggregation:\n$plan")
  }

  test("q132 plan: scoring pass is join-free and shuffle-free over the " +
    "cached compact frame") {
    val plan = SparkEntry.queries("q132_dsir_weights")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // round-15 fused shape: the bucket model is collected (bounded —
    // `buckets` rows) and inlined as a literal delta array, so the
    // scoring pass the query returns is scan-cache → project. Any Join
    // or Exchange ABOVE the cache scan means the fusion regressed to the
    // 4-stage shape. (The cached relation PRINTS its own build plan —
    // which legitimately contains the rebalance exchange — so only the
    // scoring section above InMemoryTableScan is inspected.)
    assert(plan.contains("InMemoryTableScan"),
      s"compact (bucket, tf) frame must be cached — model build and scorer " +
        s"both consume it:\n$plan")
    val scoring = plan.substring(0, plan.indexOf("InMemoryTableScan"))
    assert(!scoring.contains("Join"), s"join crept into the scoring pass:\n$plan")
    assert(!scoring.contains("Exchange"), s"shuffle in the scoring pass:\n$plan")
  }

  test("BPE dict plan: tokenizer never sinks into a Filter below the rebalance") {
    // The round-16 landmine: a non-outer explode over the RLE attribute
    // let InferFiltersFromGenerate synthesize size(tfs)>0, and pushdown
    // carried it below the repartition BY SUBSTITUTION — the whole
    // tokenize+sort chain inlined ~20x into a per-row Filter running at
    // scan parallelism (minutes instead of 2.5s on a 2-split corpus).
    // flatTf's explode_outer + post-filter keeps every graft_tokens call
    // out of Filter conditions; coalesce(2) reproduces the narrow-scan
    // trigger.
    val docs = Tables.load(spark, sfDir, "documents").coalesce(2)
    val ent = operators.BpeCodec.termFrequencyEntries(docs)
    val plan = operators.BpeCodec.flatTf(ent)
      .groupBy("w").agg(org.apache.spark.sql.functions.sum("tf").as("cnt"))
      .queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*Filter [^\\n]*graft_tokens.*"),
      s"tokenizer inlined into a Filter condition:\n$plan")
    // wordCounts (the codegen dict pass) must hold the same property
    val plan2 = operators.BpeCodec.wordCounts(docs)
      .queryExecution.executedPlan.toString
    assert(!plan2.matches("(?s).*Filter [^\\n]*graft_tokens.*"),
      s"tokenizer inlined into a Filter condition:\n$plan2")
  }

  test("q68 plan: no Expand — coarse cube levels derive from the finest aggregate") {
    val plan = SparkEntry.queries("q68_cube")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the built-in cube quadruples every input row through Expand; the
    // decomposed form aggregates the corpus once and re-aggregates the
    // ~30-row result (exact: integer counts + quantized decimal sums)
    assert(!plan.contains("Expand"), s"Expand crept back into the cube:\n$plan")
    assert(plan.contains("InMemoryTableScan"),
      s"finest-level aggregate must be cached for the three re-aggregations:\n$plan")
  }
}
