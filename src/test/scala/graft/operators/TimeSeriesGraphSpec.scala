package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-6 additions: time-series gap-fill, edge-list connected
  * components, semantic dedup, robust MAD outliers. The declared queries
  * (q77-q79) are hash-checked against DuckDB; these specs pin the
  * operator-level semantics the oracle comparison can't see (gap
  * positions, fill provenance, component minimality, contamination
  * resistance). */
class TimeSeriesGraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample emits dense grid with zero-count gaps and forward fill") {
    val events = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0),
      ("a", ts("2024-01-01 00:50:00"), 2.0),
      // hours 01 and 02 are silent for key a
      ("a", ts("2024-01-01 03:05:00"), 7.0),
      ("b", ts("2024-01-01 05:00:00"), 4.0)
    ).toDF("k", "ts", "v")
    val out = TimeSeries.resample(events, "k", "ts", "v")
      .orderBy("k", "bucket").collect()

    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getTimestamp(1).toString.substring(11, 13)).toSeq ===
      Seq("00", "01", "02", "03"))
    assert(a.map(_.getLong(2)).toSeq === Seq(2L, 0L, 0L, 1L))
    // observed buckets carry their own sum; gaps carry null + the fill
    assert(a.map(r => Option(r.get(3))).toSeq ===
      Seq(Some(3.0), None, None, Some(7.0)))
    assert(a.map(_.getDouble(4)).toSeq === Seq(3.0, 3.0, 3.0, 7.0))
    // key b: single bucket, no spine explosion beyond its own span
    val b = out.filter(_.getString(0) == "b")
    assert(b.length === 1 && b.head.getLong(2) === 1L)
  }

  test("resample leading gap keeps value_ffill null until first observation") {
    // min bucket is defined by the key's own data, so a leading gap can
    // only appear via a bucket whose values are all null
    val events = Seq(
      ("a", ts("2024-01-01 00:00:00"), Option.empty[Double]),
      ("a", ts("2024-01-01 01:00:00"), Some(5.0))
    ).toDF("k", "ts", "v")
    val out = TimeSeries.resample(events, "k", "ts", "v")
      .orderBy("bucket").collect()
    assert(Option(out(0).get(4)) === None) // nothing observed yet
    assert(out(1).getDouble(4) === 5.0)
  }

  test("ewma: hand-computed recurrence, per-key independence, alpha=1 identity") {
    val series = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-01 01:00:00"), 20.0),
      ("a", ts("2024-01-01 02:00:00"), 10.0),
      ("b", ts("2024-01-01 00:00:00"), 5.0)
    ).toDF("k", "t", "x")
    val out = TimeSeries.ewma(series, "k", "t", "x", alpha = 0.5)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    // a: 10 → .5*20+.5*10=15 → .5*10+.5*15=12.5 ; b seeds fresh at 5
    assert(out === Array(("a", 10.0), ("a", 15.0), ("a", 12.5), ("b", 5.0)))
    val id = TimeSeries.ewma(series, "k", "t", "x", alpha = 1.0)
      .orderBy("k", "t").collect().map(_.getDouble(3))
    assert(id === Array(10.0, 20.0, 10.0, 5.0)) // alpha=1 tracks the input
  }

  test("rollingMedian: odd/even window middles, spike robustness, per-key") {
    val series = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("a", ts("2024-01-01 01:00:00"), 3.0),   // even window {1,3} → 2.0
      ("a", ts("2024-01-01 02:00:00"), 100.0), // spike; {1,3,100} → 3.0
      ("a", ts("2024-01-01 03:00:00"), 5.0),   // {1,3,5,100} → 4.0
      ("b", ts("2024-01-01 00:00:00"), 7.0)
    ).toDF("k", "t", "x")
    val out = TimeSeries.rollingMedian(series, "k", "t", "x", width = 3)
      .orderBy("k", "t").collect().map(r => (r.getString(0), r.getDouble(3)))
    // width 3: windows {1},{1,3},{1,3,100},{3,100,5},{b:7}
    assert(out === Array(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 5.0), ("b", 7.0)))
  }

  test("connectedComponents: min labels, isolated vertices, direction-blind") {
    val vertices = (1L to 7L).toDF("id")
    // components {1,2,3}, {4,5} (edge given dst<src), isolated {6}, {7}
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L)).toDF("src", "dst")
    val comp = Graph.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L))
  }

  test("connectedComponents: validateEdges fails loudly on phantom endpoints") {
    val vertices = Seq(5L, 6L).toDF("id")
    // endpoint 0 is not a vertex: under the documented precondition this
    // is malformed input — label-seeding from endpoints would let 5 take
    // component id 0 (not a vertex) silently
    val edges = Seq((0L, 5L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.connectedComponents(vertices, edges, validateEdges = true)
    }
    assert(e.getMessage.contains("edge endpoint"))
    // clean edges pass validation unchanged
    val ok = Graph.connectedComponents(Seq(5L, 6L).toDF("id"),
      Seq((5L, 6L)).toDF("src", "dst"), validateEdges = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok === Map(5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents: long chain converges within maxIter") {
    // path graph 0-1-2-...-19: worst-case diameter for label propagation
    val n = 20L
    val vertices = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = Graph.connectedComponents(vertices, edges, maxIter = 25)
    assert(comp.filter(col("component") =!= 0L).count() === 0)
  }

  test("semanticDedupGroups keeps min-id representative per cluster") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val groups = Similarity.semanticDedupGroups(emb, threshold = 0.3)
    val total = emb.count()
    assert(groups.count() === total) // every vector classified
    // each cluster's kept member is exactly its min id
    val bad = groups.groupBy("cluster_id")
      .agg(min("vec_id").as("mn"),
        sum(when(col("keep"), col("vec_id"))).as("keptId"),
        sum(when(col("keep"), 1).otherwise(0)).as("nKept"))
      .filter(col("nKept") =!= 1 || col("keptId") =!= col("mn") ||
        col("mn") =!= col("cluster_id"))
    assert(bad.count() === 0)
    // dedup actually fires on this data: fewer clusters than vectors
    assert(groups.select("cluster_id").distinct().count() < total)
    // clusters agree with the pair graph: every edge lands in one cluster
    val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.3)
    val byId = groups.select("vec_id", "cluster_id")
    val crossCluster = pairs
      .join(byId.toDF("vec_a", "ca"), "vec_a")
      .join(byId.toDF("vec_b", "cb"), "vec_b")
      .filter(col("ca") =!= col("cb"))
    assert(crossCluster.count() === 0)
  }

  test("semanticDedupGroups: dense-bucket escalation matches the exact path") {
    // A planted viral cluster well past the cap (600 near-identical copies
    // of one base vector vs a cap of 64 in this test) plus untouched organic
    // vectors: the escalated star+chain spanning set must produce the SAME
    // components as exhaustive in-bucket pair enumeration — the q78 SCALE
    // battery measures the wall win, this pins the output contract. The cap
    // sits ABOVE every organic bucket (the operator's deployment contract:
    // the cap separates viral clusters from organic buckets — a cap below
    // organic bucket sizes escalates MIXED buckets, where the spanning set
    // legitimately prunes pairs and components may differ).
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
    val dense = base.filter(col("vec_id") === 0)
      .crossJoin(spark.range(600).select(col("id").as("rep")))
      .select((lit(90000000L) + col("rep")).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "x + float(0.0001) * float(rep % 7))").as("embedding"))
    val emb = base.unionByName(dense)
    val exact = Similarity.semanticDedupGroups(emb, threshold = 0.3,
      denseBucketCap = 0)
    val escalated = Similarity.semanticDedupGroups(emb, threshold = 0.3,
      denseBucketCap = 64)
    assert(escalated.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(escalated).count() === 0)
    // the planted copies all landed in one cluster (the escalated path
    // did not split the viral component)
    assert(escalated.filter(col("vec_id") >= 90000000L)
      .select("cluster_id").distinct().count() === 1)
  }

  test("madOutlierSummary resists contamination that masks the z-score gate") {
    // 100 values near 10, plus two 1e6 spikes: the spikes inflate stddev so
    // a 3-sigma gate sees at most the spikes themselves; median/MAD flags
    // them with a huge robust z regardless
    val base = (1 to 100).map(i => ("g", 10.0 + (i % 7) * 0.1))
    val dirty = base ++ Seq(("g", 1e6), ("g", 1e6))
    val df = dirty.toDF("grp", "v")
    val mad = DataQuality.madOutlierSummary(df, "grp", "v").collect()
    assert(mad.length === 1)
    assert(mad.head.getLong(1) === 2L)
    assert(mad.head.getDouble(2) > 1e6) // robust z of the spikes is enormous
    // the classical gate's max_z is tiny by comparison (stddev absorbed it)
    val zs = DataQuality.zscoreOutlierSummary(df, "grp", "v").collect()
    assert(zs.isEmpty || zs.head.getDouble(2) < 15.0)
  }

  test("madOutlierSummary skips mad=0 groups instead of dividing by zero") {
    val df = (Seq.fill(10)(("const", 5.0)) ++ Seq(("const", 99.0)))
      .toDF("grp", "v")
    // median=5, mad=0 (majority identical) → group skipped entirely
    assert(DataQuality.madOutlierSummary(df, "grp", "v").collect().isEmpty)
  }

  /** Round-19: the size-gated driver finishers must agree exactly with the
    * distributed propagation loops they replace under the cap. Force the
    * distributed path by zeroing the caps, compare against the default
    * (driver) path on the same inputs. */
  test("connectedComponents: driver union-find == distributed propagation") {
    import spark.implicits._
    // mixed structure: clique, chain, isolated vertices, dst<src edges
    val vertices = (0L to 30L).toDF("id")
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 9L)) ++
      (20L until 29L).map(i => (i, i + 1))).toDF("src", "dst")
    def run(): Map[Long, Long] =
      Graph.connectedComponents(vertices, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = run()
    spark.conf.set("graft.graph.maxDriverEdges", "0")
    val viaLoop = try run() finally spark.conf.unset("graft.graph.maxDriverEdges")
    assert(viaDriver === viaLoop)
    assert(viaDriver(3L) === 1L && viaDriver(9L) === 9L && viaDriver(28L) === 20L)
  }

  test("pagerank: driver power loop == distributed loop (round to 12)") {
    import spark.implicits._
    val vertices = (0L to 5L).toDF("id")
    // vertex 5 dangling (no out-edges) so the dangling branch is exercised
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (0L, 5L))
      .toDF("src", "dst")
    def run(): Map[Long, Double] =
      Graph.pagerank(vertices, edges, iterations = 10)
        .select(col("id"), round(col("rank"), 12).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaDriver = run()
    spark.conf.set("graft.pagerank.maxDriverVertices", "0")
    val viaLoop = try run()
      finally spark.conf.unset("graft.pagerank.maxDriverVertices")
    // float sums may reassociate between the two paths; rank invariants and
    // 12-decimal agreement (the declared q92 rounds to 8) must hold
    assert(viaDriver.keySet === viaLoop.keySet)
    viaDriver.foreach { case (id, r) => assert(math.abs(r - viaLoop(id)) < 1e-12) }
    assert(math.abs(viaDriver.values.sum - 1.0) < 1e-9)
  }

  test("minhashLshGroups: driver union-find == distributed propagation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),   // dup of 1
      (3L, "alpha beta gamma delta epsilon eta"),    // near-dup of 1
      (4L, "one two three four five six"),
      (5L, "one two three four five six"),           // dup of 4
      (6L, "totally unrelated text about nothing")
    ).toDF("doc_id", "text")
    def run(): Map[Long, Long] =
      TextDedup.minhashLshGroups(docs, k = 12, bands = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = run()
    spark.conf.set("graft.graph.maxDriverMembership", "0")
    val viaLoop = try run()
      finally spark.conf.unset("graft.graph.maxDriverMembership")
    assert(viaDriver === viaLoop)
    assert(viaDriver(2L) === viaDriver(1L) && viaDriver(5L) === 4L)
  }
}
