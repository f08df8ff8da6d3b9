package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Behavior tests for the dedup / similarity / analysis / multimodal
  * extensions (cross-engine value parity is covered by the DuckDB oracle
  * gate; these assert semantics). */
class ExtensionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("chunkTokens: overlapping windows cover every token, short docs one chunk") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, (1 to 150).map(i => s"w$i").mkString(" ")), // 150 tokens → 3 chunks
      (2L, "just a few tokens")                        // short → 1 chunk
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, window = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._2).toSeq === Seq(0L, 1L, 2L))
    assert(d1(0)._4 === 64L && d1(1)._4 === 64L && d1(2)._4 === 54L) // 150-96
    assert(d1(0)._3.startsWith("w1 ") && d1(1)._3.startsWith("w49 ")
      && d1(2)._3.startsWith("w97 "))
    // stride < window → consecutive chunks overlap by window-stride tokens
    assert(d1(0)._3.split(" ").drop(48).toSeq === d1(1)._3.split(" ").take(16).toSeq)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length === 1 && d2.head._4 === 4L)
    // every token of doc 1 appears in some chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert((1 to 150).forall(i => covered.contains(s"w$i")))
  }

  test("cdcChunks: contiguous cover, stable fingerprints after a head edit") {
    val rnd = new scala.util.Random(106)
    val base = (1 to 400).map(_ => s"t${rnd.nextInt(500)}")
    val in = Seq(
      (1L, base.mkString(" ")),
      (2L, ("inserted junk tokens " + base.mkString(" "))), // head edit of doc 1
      (3L, "one"),                                          // no boundary → 1 chunk
      (4L, "   "))                                          // empty → no rows
    .toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunks(in).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    def chunksOf(id: Long) = out.filter(_._1 == id).sortBy(_._2)
    // contiguous exact cover: chunk 0 starts at 1, each next chunk starts
    // right after the previous, totals equal the token count
    for (id <- Seq(1L, 2L, 3L)) {
      val cs = chunksOf(id)
      assert(cs.head._3 === 1L)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4); case _ =>
      }
    }
    assert(chunksOf(1L).map(_._4).sum === 400L)
    assert(chunksOf(3L).length === 1)
    assert(!out.exists(_._1 == 4L))
    // THE content-defined property: a head insertion re-chunks only up to
    // the first boundary — every later chunk keeps its fingerprint (a
    // fixed-window chunker shifts and re-fingerprints everything)
    val h1 = chunksOf(1L).map(_._5)
    val h2 = chunksOf(2L).map(_._5)
    assert(h1.length > 10, s"want many chunks, got ${h1.length}") // avg 16 over 400
    assert(h2.takeRight(h1.length - 1).toSeq === h1.drop(1).toSeq)
  }

  test("SketchRollup: bucket-sketch union == one full-data sketch, gated accuracy") {
    import org.apache.spark.sql.functions.{hll_sketch_agg, hll_sketch_estimate, lit => flit}
    val df = (1 to 6000).map(i => (i % 3, s"u${i % 997}", i % 10))
      .toDF("k", "u", "day")
    val daily = SketchRollup.buildSketches(df, Seq("k"), col("day"), col("u"))
    // the sketch column survives a parquet round trip (it is a lake column)
    val lake = java.nio.file.Files.createTempDirectory("graft-sk").toString + "/t"
    daily.write.parquet(lake)
    val merged = SketchRollup.mergedEstimate(spark.read.parquet(lake), Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the mergeability property: union of per-bucket sketches estimates
    // what one sketch over the full data estimates (same registers; the
    // union gadget's HLL_8 estimator can differ from the direct sketch's
    // by a fraction of a percent, so the assert is estimate-level, not
    // bit-level) — this is what makes persisted sketches re-mergeable
    // along any dimension
    val full = df.groupBy("k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"), flit(12)))
        .cast("long").as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    merged.foreach { case (k, m) =>
      assert(math.abs(m - full(k)).toDouble / full(k) <= 0.01,
        s"k=$k merged=$m full=${full(k)}")
    }
    // accuracy against the exact twin (997 distinct users per k here)
    val exact = df.groupBy("k").agg(countDistinct(col("u")).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    merged.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)).toDouble / exact(k) <= 0.05, s"k=$k a=$a e=${exact(k)}")
    }
    // n_rows partial sums roll up with the sketches
    val n = SketchRollup.mergedEstimate(daily, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n_rows")).toMap
    assert(n.values.sum === 6000L)
  }

  test("exactGroups collapses literal duplicates") {
    val in = Seq((1L, "hello   world"), (2L, "Hello world"), (3L, "different")).toDF("doc_id", "text")
    val out = TextDedup.exactGroups(in).collect()
    assert(out.length === 2) // whitespace+case normalization unifies 1 and 2
    val dup = out.find(_.getAs[Long]("n_docs") == 2).get
    assert(dup.getAs[Long]("canonical_id") === 1L)
  }

  test("minhashLshPairs finds planted near-duplicates, est_jaccard high") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val nearDup = base.replace("lazy", "sleepy")
    val other = "completely unrelated text about spark query engines and columnar execution at scale"
    val in = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = TextDedup.minhashLshPairs(in).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("est_jaccard") > 0.3)
  }

  test("minhashLshGroups assigns one cluster per duplicate group, singletons to themselves") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    val in = Seq(
      (10L, base), (11L, base + " again"), (12L, base), // one near-dup cluster
      (20L, "completely unrelated text about spark query engines and columnar execution at scale"),
      (30L, "another standalone document with its own entirely different vocabulary and topic words")
    ).toDF("doc_id", "text")
    val out = TextDedup.minhashLshGroups(in).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) === 10L && out(12L) === 10L) // exact dups share min-id cluster
    assert(out(11L) === 10L)                     // near-dup joins the cluster
    assert(out(20L) === 20L && out(30L) === 30L) // singletons
    // groups agree with the pair graph: every pair's docs share a cluster
    val pairs = TextDedup.minhashLshPairs(in).collect()
    pairs.foreach(p => assert(out(p.getLong(0)) === out(p.getLong(1))))
  }

  test("minhashLshGroups chains transitive clusters across buckets") {
    // A ~ B and B ~ C but A !~ C directly: the component must still unify
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi"
    val b = a.replace("alpha beta gamma delta", "alpha beta gamma CHANGED")
    val c = b.replace("omicron pi", "CHANGED2 pi")
    val in = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = TextDedup.minhashLshPairs(in).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = TextDedup.minhashLshGroups(in).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // regardless of which pairs LSH surfaces, components must be consistent
    pairs.foreach(p => assert(out(p._1) === out(p._2)))
    if (pairs.nonEmpty) info(s"pairs=$pairs clusters=$out")
  }

  test("simhash: identical docs distance 0; near-dups within 3; distinct docs far") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    val in = Seq((1L, base), (2L, base), (3L, base + " extra"),
      (4L, "totally different content about columnar engines")).toDF("doc_id", "text")
    val sig = TextDedup.simhashSignatures(in).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) === sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(4L)) > 10)
    val pairs = TextDedup.simhashPairs(in).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("ngramJaccardPairs: exact jaccard for planted dup") {
    val base = "a b c d e f g h i j k l m n o p"
    val in = Seq((1L, base), (2L, base), (3L, "z y x w v u t s")).toDF("doc_id", "text")
    val out = TextDedup.ngramJaccardPairs(in, minJaccard = 0.5).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("jaccard") === 1.0)
  }

  test("bruteForceTopK is ordered and self-similarity excluded upstream") {
    val q = embeddings.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val top = Similarity.bruteForceTopK(embeddings.filter($"vec_id" =!= 0), q, k = 5).collect()
    assert(top.length === 5)
    val sims = top.map(_.getAs[Double]("cosine"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("ANN topK retrieves planted near-duplicates (genuine neighbors)") {
    // The synthetic embeddings are i.i.d. gaussian: "nearest" neighbors are
    // nearly orthogonal (max pairwise cos ≈ 0.5), which no LSH can bucket —
    // so plant real near-duplicates of the query and require ANN to find
    // them, the property an ANN index actually promises.
    val v0 = embeddings.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val planted = (1 to 5).map { p =>
      (9000L + p, v0.zipWithIndex.map { case (x, d) =>
        x * (1.0f + 0.02f * p * ((d % 3) - 1)) })
    }
    val corpus = embeddings.filter($"vec_id" =!= 0)
      .select($"vec_id", $"embedding")
      .union(planted.toDF("vec_id", "embedding"))
    val q = embeddings.filter($"vec_id" === 0).select($"embedding".as("qv"))

    val exact = Similarity.bruteForceTopK(corpus, q, 10).collect().map(_.getLong(0)).toSet
    assert(planted.map(_._1).toSet.subsetOf(exact)) // sanity: they ARE the top

    val lsh = Similarity.SignLsh(nBits = 8, dim = 64)
    val approx = lsh.topK(lsh.index(corpus), q, 10).collect().map(_.getLong(0)).toSet
    val foundPlanted = (planted.map(_._1).toSet intersect approx).size
    info(s"ANN found $foundPlanted/5 planted near-dups; recall@10 = ${(exact intersect approx).size / 10.0}")
    assert(foundPlanted === 5)
  }

  test("multi-probe sign-LSH: Hamming<=2 ball is exact and recall is monotone in radius") {
    val lsh = Similarity.SignLsh(nBits = 8, dim = 64)
    val ball = lsh.probesFor(0x5a, 2)
    assert(ball.size === 1 + 8 + 28)
    assert(ball.distinct.size === ball.size)
    assert(ball.forall(b => Integer.bitCount(b ^ 0x5a) <= 2))
    assert(lsh.probesFor(0x5a, 1).toSet ===
      ball.filter(b => Integer.bitCount(b ^ 0x5a) <= 1).toSet)

    val corpus = embeddings.filter($"vec_id" =!= 0)
    val q = embeddings.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val exact = Similarity.bruteForceTopK(corpus, q, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = lsh.index(corpus)
    def recall(h: Int) = lsh.topK(idx, q, 10, probeHamming = h)
      .collect().map(_.getLong(0)).toSet.intersect(exact).size
    val (r1, r2) = (recall(1), recall(2))
    info(s"corpus recall@10: probe1=$r1/10 probe2=$r2/10")
    // a wider probe ball re-scores a superset of candidates — recall can
    // only grow with the radius
    assert(r2 >= r1)
  }

  test("multi-table sign-LSH: q25's default config clears corpus recall@10 >= 0.5") {
    // The round-11 regression this pins: planted recall can be 1.0 while
    // ORGANIC-neighbor recall is 0.1 (single table, Hamming<=1). The
    // shipped q25 config (4 tables x 8 bits, Hamming<=2) must recover at
    // least half the brute-force top-10 on the real corpus — the same
    // bound the declared query's recallGate enforces at runtime.
    val lsh = Similarity.SignLsh(nBits = 8, dim = 64, nTables = 4)
    val corpus = embeddings.filter($"vec_id" =!= 0)
    val q = embeddings.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val exact = Similarity.bruteForceTopK(corpus, q, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = lsh.index(corpus)
    val approx = lsh.topK(idx, q, 10, probeHamming = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = approx.intersect(exact).size / 10.0
    // cost side: the probe must still PRUNE (not degenerate to brute force)
    val qv = embeddings.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val frac = lsh.candidateFraction(idx, qv, probeHamming = 2)
    info(f"4x8 Hamming<=2: corpus recall@10 = $recall%.1f, scan fraction = $frac%.3f")
    assert(recall >= 0.5, s"corpus recall@10 $recall < 0.5 at the q25 default config")
    assert(frac < 0.8, s"probe set covers $frac of the corpus — no longer approximate")
  }

  test("PQ: deterministic codebooks, 8-int codes, planted near-dups survive ADC+rerank") {
    val pq = Similarity.Pq(m = 8, nCodes = 16)
    // determinism: same seed → bit-identical codebooks
    val cb1 = pq.train(embeddings.filter($"vec_id" =!= 0))
    val cb2 = pq.train(embeddings.filter($"vec_id" =!= 0))
    assert(cb1.length === 8)
    assert(cb1.flatten.flatten.toSeq === cb2.flatten.flatten.toSeq)

    // compression: a 64-float vector becomes exactly m small int codes
    val codes = pq.encode(cb1, embeddings.filter($"vec_id" =!= 0))
    val row = codes.head()
    assert(row.getSeq[Int](1).length === 8)
    assert(row.getSeq[Int](1).forall(c => c >= 0 && c < 16))

    // retrieval promise (the planted-near-dup recipe): ADC shortlist +
    // exact re-rank must surface true near-duplicates of the query
    val v0 = embeddings.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).toArray
    val planted = (1 to 5).map { p =>
      (9000L + p, v0.zipWithIndex.map { case (x, d) =>
        x * (1.0f + 0.02f * p * ((d % 3) - 1)) })
    }
    val corpus = embeddings.filter($"vec_id" =!= 0)
      .select($"vec_id", $"embedding")
      .union(planted.toDF("vec_id", "embedding"))
    val cb = pq.train(corpus)
    val corpusCodes = pq.encode(cb, corpus)
    val qv = v0.map(_.toDouble)
    val top = pq.topK(cb, corpusCodes, corpus, qv, k = 10, shortlist = 50)
      .collect().map(_.getLong(0)).toSet
    val found = planted.map(_._1).toSet intersect top
    info(s"PQ found $found of 5 planted near-dups in top-10")
    assert(found.size === 5)
  }

  test("persisted sign-LSH index probes identically to the in-memory join path") {
    val lsh = Similarity.SignLsh(nBits = 8, dim = 64)
    val corpus = embeddings.filter($"vec_id" =!= 0)
    val qv = embeddings.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val q = embeddings.filter($"vec_id" === 0).select($"embedding".as("qv"))

    val path = tempDir("lsh-index") + "/signlsh_8_64"
    val persisted = lsh.loadOrBuild(spark, corpus, path)
    // second call is a pure read — must not rebuild (by-name corpus unused)
    val again = lsh.loadOrBuild(spark,
      sys.error("should not be evaluated"): org.apache.spark.sql.DataFrame, path)

    val viaJoin = lsh.topK(lsh.index(corpus), q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaPruned = lsh.topKPruned(persisted, qv, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaReload = lsh.topKPruned(again, qv, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaPruned === viaJoin)
    assert(viaReload === viaJoin)
  }

  test("index path tracks source data: a table rewrite triggers rebuild, not stale serving") {
    val src = tempDir("stale-src") + "/embeddings.parquet"
    val lsh = Similarity.SignLsh(nBits = 8, dim = 64)
    embeddings.filter($"vec_id" =!= 0).write.mode("overwrite").parquet(src)

    val p1 = Similarity.IndexStore.pathFor(spark, src, "signlsh_8_64")
    lsh.loadOrBuild(spark, spark.read.parquet(src), p1)
    assert(Similarity.IndexStore.isBuilt(spark, p1))

    // overwrite the source table with a shifted id-space — the fingerprint
    // (names/sizes/mtimes) changes, so the index path must change too
    embeddings.filter($"vec_id" =!= 0)
      .withColumn("vec_id", $"vec_id" + 100000L)
      .write.mode("overwrite").parquet(src)
    val p2 = Similarity.IndexStore.pathFor(spark, src, "signlsh_8_64")
    assert(p2 !== p1)
    assert(!Similarity.IndexStore.isBuilt(spark, p2)) // → next query rebuilds

    val idx2 = lsh.loadOrBuild(spark, spark.read.parquet(src), p2)
    val ids = idx2.select("vec_id").collect().map(_.getLong(0))
    assert(ids.forall(_ >= 100000L)) // the rebuilt index serves the NEW data
  }

  test("persisted IVF index returns the trained-index answer without retraining") {
    val ivf = Similarity.Ivf(nCentroids = 8, nProbe = 2)
    val corpus = embeddings.filter($"vec_id" =!= 0)
    val q = embeddings.filter($"vec_id" === 0).select($"embedding".as("qv"))

    val path = tempDir("ivf-index") + "/ivf_8_2"
    val (centers1, idx1) = ivf.loadOrBuild(spark, corpus, path)
    val (centers2, idx2) = ivf.loadOrBuild(spark,
      sys.error("should not be evaluated"): org.apache.spark.sql.DataFrame, path)
    assert(centers1.map(_.toSeq).toSeq === centers2.map(_.toSeq).toSeq)

    val r1 = ivf.topK(centers1, idx1, q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val r2 = ivf.topK(centers2, idx2, q, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(r1 === r2)
    assert(r1.length === 10)
  }

  test("editDistancePairs finds planted same-source near-identical docs") {
    // q47 returns 0 rows on the synthetic corpus at both oracle SFs — this
    // plants true near-duplicates so the edit-distance path is verified on
    // non-empty output (pairs blocked on (source, len/10 bucket)).
    val base = "x" * 60 + "abcdefghij"
    val in = Seq(
      (1L, "web", 70L, base),                        // identical prefix pair with 2
      (2L, "web", 70L, base.dropRight(2) + "XY"),    // distance 2 from 1
      (3L, "web", 71L, base + "z"),                  // same bucket (71/10 == 70/10)
      (4L, "books", 70L, base),                      // different source: never paired
      (5L, "web", 250L, "y" * 250)                   // different bucket: never paired
    ).toDF("doc_id", "source", "n_chars", "text")
    val out = TextDedup.editDistancePairs(in, maxDistance = 40, prefixLen = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === Set((1L, 2L, 2), (1L, 3L, 1), (2L, 3L, 3)))
  }

  test("RangeJoin two-sided blocking includes boundary-straddling pairs") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val in = Seq(
      (1L, 100L, ts("2024-01-01 10:59:30")), // :59 → :01 pair with event 2
      (2L, 100L, ts("2024-01-01 11:01:00")),
      (3L, 100L, ts("2024-01-01 11:02:00")), // same-hour pair with 2
      (4L, 100L, ts("2024-01-01 12:30:00")), // > 5 min from everything
      (5L, 200L, ts("2024-01-01 11:00:00"))  // different user: never paired
    ).toDF("event_id", "user_id", "ts")
    val out = RangeJoin.withinWindowPairs(in,
        keyCols = Seq("user_id"), tsCol = "ts",
        window = expr("INTERVAL 5 MINUTES"),
        outA = Seq("event_id" -> "event_a"), outB = Seq("event_id" -> "event_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) and (1,3) straddle the hour boundary — the pairs one-sided
    // blocking drops; (2,3) is the plain same-hour pair
    assert(out === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("langId is deterministic and covers markers") {
    val in = Seq(
      (1L, "the cat and the dog and the bird"),
      (2L, "der hund und der vogel und der fisch"),
      (3L, "xyz qrs tuv")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(in).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("predicted_lang")).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "unknown"))
  }

  test("ColumnStats.profile: typed min/max, null counts, exact vs approx distinct") {
    val in = Seq(
      (9L, Some(2.5), "b"), (10L, None, "a"), (100L, Some(104.75), "a"))
      .toDF("k", "v", "s")
    val p = ColumnStats.profile(in, Seq("k", "v", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getAs[Long]("n_rows") === 3L)
    assert(p("k").getAs[Long]("n_nulls") === 0L)
    assert(p("k").getAs[Long]("n_distinct") === 3L)
    // typed ordering: 9 < 100 numerically (lexicographic would say "100" < "9")
    assert(p("k").getAs[String]("min_value") === "9")
    assert(p("k").getAs[String]("max_value") === "100")
    assert(p("v").getAs[Long]("n_nulls") === 1L)
    assert(p("v").getAs[Long]("n_distinct") === 2L) // distinct ignores nulls
    assert(p("v").getAs[String]("max_value") === "104.750000") // decimal(28,6) text
    assert(p("s").getAs[String]("min_value") === "a")
    // HLL variant (the 100 TB path) agrees on this tiny input
    val approx = ColumnStats.profile(in, Seq("k"), exactDistinct = false)
      .head().getAs[Long]("n_distinct")
    assert(approx === 3L)
  }

  test("ColumnStats.profile survives NaN/Infinity/huge doubles (no ANSI crash)") {
    val messy = Seq(Double.NaN, Double.PositiveInfinity, 1e30, -1.5)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
    val row = ColumnStats.profile(messy, Seq("v")).head()
    assert(row.getAs[Long]("n_rows") === 4L)
    // NaN sorts greatest in Spark: max is NaN, min is -1.5 (decimal form)
    assert(row.getAs[String]("max_value") === "NaN")
    assert(row.getAs[String]("min_value") === "-1.500000")
  }

  test("repetitionStats flags looped text, passes diverse text") {
    val looped = Seq.fill(50)("spam ham").mkString(" ") // 99 bigrams, 2 distinct
    val diverse = (1 to 100).map(i => s"w$i").mkString(" ") // all bigrams unique
    val in = Seq((1L, looped), (2L, diverse), (3L, "single")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(in).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L)) // <2 tokens → no bigrams → dropped
    assert(out(1L).getAs[Long]("n_bigrams") === 99L)
    assert(out(1L).getAs[Long]("distinct_bigrams") === 2L)
    assert(out(1L).getAs[Double]("top_bigram_share") === 0.5051) // 50/99
    assert(out(1L).getAs[Double]("repetition") === 0.9798)       // 1 - 2/99
    assert(out(2L).getAs[Double]("repetition") === 0.0)
    assert(out(2L).getAs[Double]("top_bigram_share") < 0.02)
  }

  test("gopherRules: each rule flips on its own violation, keep is the conjunction") {
    val good = ((1 to 58).map(i => s"word$i") ++ Seq("the", "of")).mkString(" ")
    val short = "the of just a few words here"                    // < 50 words
    val longWords = ((1 to 48).map(_ => "supercalifrag") ++ Seq("the", "of")).mkString(" ")
    val symbols = ((1 to 40).map(i => s"w$i") ++ (1 to 8).map(_ => "#") ++
      Seq("the", "of", "...", "...")).mkString(" ")               // 12/52 symbols
    val noStops = (1 to 60).map(i => s"word$i").mkString(" ")
    val in = Seq(1L -> good, 2L -> short, 3L -> longWords, 4L -> symbols,
      5L -> noStops).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(in).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = Seq("r_word_count", "r_mean_word_len",
      "r_symbol_ratio", "r_alpha_words", "r_stopwords", "keep")
      .map(c => out(id).getAs[Boolean](c))
    assert(flags(1L) === Seq(true, true, true, true, true, true))
    assert(flags(2L).head === false && !out(2L).getAs[Boolean]("keep"))
    assert(flags(3L) === Seq(true, false, true, true, true, false))
    val s4 = flags(4L)
    assert(!s4(2) && !s4.last, "symbol-heavy doc must fail r_symbol_ratio")
    assert(flags(5L) === Seq(true, true, true, true, false, false))
    // signal sanity on the symbol doc: 8 '#' + 2 '...' over 52 words
    assert(out(4L).getAs[Long]("n_words") === 52L)
    assert(math.abs(out(4L).getAs[Double]("symbol_ratio") - 10.0 / 52) < 1e-3)
  }

  test("noveltyScores: first writer gets 1.0, a copy 0.0, partial overlap the exact fraction") {
    val in = Seq(
      1L -> "a b c d e f",  // grams abc bcd cde def — all first here
      2L -> "a b c d e f",  // exact copy → nothing novel
      3L -> "a b c x y z"   // abc seen (doc 1); bcx cxy xyz novel → 3/4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(in).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 4L, 1.0)))
    assert(out(2L) === ((4L, 0L, 0.0)))
    assert(out(3L) === ((4L, 3L, 0.75)))
  }

  test("noveltyScores: reshaped single-aggregation path equals the gram-join formulation") {
    import graft.functions.TextFunctions.{shinglesFromTokens, tokensFast}
    // traps: repeated trigram inside one doc (array_distinct), doc shorter
    // than 3 tokens (no grams → no row), empty/whitespace text, a doc with
    // zero novel grams, ties on the first-occurrence doc, unicode tokens
    val in = Seq(
      10L -> "a b c d e f",
      11L -> "a b c a b c a b c", // duplicate grams within one doc
      12L -> "a b",               // too short — drops out
      13L -> "",                  // empty — drops out
      14L -> "a b c d e f",       // exact copy — zero novel
      15L -> "μ ν ξ a b c",       // unicode + one seen gram
      16L -> "   "                // whitespace only — drops out
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScores(in)
    // the pre-round-20 formulation, inline: gram join + per-gram indicator
    val grams = in
      .select(col("doc_id"), explode(shinglesFromTokens(tokensFast(col("text")))).as("sh"))
    val firsts = grams.groupBy(col("sh")).agg(min(col("doc_id")).as("__first"))
    val want = grams.join(firsts, "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 4).as("novelty"))
    val g = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val w = want.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(g === w)
    assert(g.map(_._1).toSet === Set(10L, 11L, 14L, 15L))
  }

  test("qualityScore is bounded [0,1] on real docs") {
    val scores = TextAnalysis.qualityScore(docs).select("quality_score")
      .collect().map(_.getDouble(0))
    assert(scores.nonEmpty)
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("multimodal: decode is deterministic, resize bounds the box, frames explode") {
    val media = Multimodal.payloadFromText(docs.limit(20))
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.length === 20)
    assert(feats.forall(f => f.width >= 1 && f.width <= 1024 && f.brightness <= 1.0))
    // determinism
    val again = Multimodal.imageFeatures(media).collect()
    assert(feats.sortBy(_.media_id).toSeq === again.sortBy(_.media_id).toSeq)
    // resize
    val resized = Multimodal.resizeFeatures(media, maxSide = 64).collect()
    assert(resized.forall(f => f.width <= 64 && f.height <= 64))
    // frame sampling: one row per frame
    val frames = Multimodal.sampleFrames(media, nFrames = 4).collect()
    assert(frames.length === 80)
  }

  test("real PNG decode: generated bytes are true PNG and features round-trip") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 47L, 48L, 255L, 256L, 2303L, 2304L).toDF("doc_id")
    val media = Multimodal.pngPayloadFromId(ids).collect()
    // the payloads are REAL PNG files: magic bytes present, ImageIO decodes
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
    assert(media.forall(_.payload.take(4).sameElements(pngMagic)))

    val feats = Multimodal.imageFeatures(
      Multimodal.pngPayloadFromId(ids), Multimodal.ImageIoDecoder)
      .collect().map(f => f.media_id -> f).toMap
    media.foreach { m =>
      val id = m.media_id
      val f = feats(id)
      assert(f.width === (id % 48 + 8).toInt, s"width of id=$id")
      assert(f.height === ((id / 48) % 48 + 8).toInt, s"height of id=$id")
      val expected = ((id % 256) + (7 * id + 31) % 256 + (13 * id + 101) % 256) /
        (3.0 * 255.0)
      assert(math.abs(f.brightness - expected) < 1e-4, s"brightness of id=$id")
      assert(f.n_bytes === m.payload.length.toLong)
    }

    // decoder fails loudly on junk instead of fabricating features
    intercept[Exception] {
      Multimodal.ImageIoDecoder.decodeImage("not a png".getBytes)
    }
  }

  test("real JPEG decode: dimensions exact, brightness within lossy tolerance") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 47L, 255L, 2304L).toDF("doc_id")
    val media = Multimodal.jpegPayloadFromId(ids).collect()
    // true JFIF payloads: SOI marker 0xFFD8
    assert(media.forall(m =>
      (m.payload(0) & 0xff) == 0xff && (m.payload(1) & 0xff) == 0xd8))
    val feats = Multimodal.imageFeatures(
        Multimodal.jpegPayloadFromId(ids), Multimodal.ImageIoDecoder)
      .collect().map(f => f.media_id -> f).toMap
    media.foreach { m =>
      val id = m.media_id
      val f = feats(id)
      assert(f.width === (id % 48 + 8).toInt, s"width of id=$id")
      assert(f.height === ((id / 48) % 48 + 8).toInt, s"height of id=$id")
      val expected = ((id % 256) + (7 * id + 31) % 256 + (13 * id + 101) % 256) /
        (3.0 * 255.0)
      // JPEG is lossy: dimensions survive exactly, pixels approximately
      assert(math.abs(f.brightness - expected) < 0.05, s"brightness of id=$id")
    }
  }

  test("real MJPEG-AVI decode: container walks, frame count/dims exact, brightness tolerant") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 47L, 255L, 2304L).toDF("doc_id")
    val media = Multimodal.aviPayloadFromId(ids).collect()
    // true RIFF/AVI payloads: 'RIFF' .... 'AVI '
    assert(media.forall(m =>
      new String(m.payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(m.payload, 8, 4, "US-ASCII") == "AVI "))
    val (valid, rejects, _) =
      Multimodal.videoFramesOrReject(Multimodal.aviPayloadFromId(ids))
    assert(rejects.count() === 0)
    val frames = valid.collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx")) -> r).toMap
    media.foreach { m =>
      val id = m.media_id
      val n = (id % 3 + 2).toInt
      assert((0 until n).forall(f => frames.contains(id -> f)), s"frames of id=$id")
      assert(!frames.contains(id -> n), s"phantom frame for id=$id")
      (0 until n).foreach { f =>
        val r = frames(id -> f)
        assert(r.getAs[Int]("n_frames") === n)
        assert(r.getAs[Int]("width") === (id % 48 + 8).toInt)
        assert(r.getAs[Int]("height") === ((id / 48) % 48 + 8).toInt)
        val expected = (((id + 29 * f) % 256) + (7 * id + 31 * f + 31) % 256 +
          (13 * id + 17 * f + 101) % 256) / (3.0 * 255.0)
        // per-FRAME color: a parser that reorders or repeats frames fails
        // here even with count/geometry right. JPEG-lossy tolerance.
        assert(math.abs(r.getAs[Double]("brightness") - expected) < 0.05,
          s"brightness of id=$id frame=$f")
      }
    }
  }

  test("corrupt video dead-letters: truncated AVI, torn chunk, and junk route to rejects") {
    import spark.implicits._
    val good = Multimodal.aviPayloadFromId(Seq(5L).toDF("doc_id")).collect()(0)
    val truncated = java.util.Arrays.copyOf(good.payload, good.payload.length / 2)
    val junk = Array.fill[Byte](64)(0x5a)
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", good.payload),
      Multimodal.MediaRecord(2L, "video", truncated),
      Multimodal.MediaRecord(3L, "video", junk)).toDS()
    val (valid, rejects, _) = Multimodal.videoFramesOrReject(media)
    assert(valid.select("media_id").distinct().collect().map(_.getLong(0)).toSet === Set(1L))
    val errs = rejects.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(errs.keySet === Set(2L, 3L))
    assert(errs.values.forall(_.nonEmpty))
  }

  test("corrupt media dead-letters: truncated PNG and junk route to rejects with the error") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val good = Multimodal.pngPayloadFromId(ids).collect()
    val corrupted = good.map { m =>
      m.media_id match {
        case 2L => m.copy(payload = m.payload.take(m.payload.length / 2)) // truncated
        case 3L => m.copy(payload = "junk, not an image".getBytes)        // wrong container
        case _  => m
      }
    }.toSeq.toDS()
    val (valid, rejects, decoded) =
      Multimodal.imageFeaturesOrReject(corrupted, Multimodal.ImageIoDecoder)
    decoded.persist()
    val v = valid.collect()
    val r = rejects.collect()
    decoded.unpersist()
    assert(v.map(_.getLong(0)).toSet === Set(1L))
    assert(v.head.getAs[Int]("width") === (1L % 48 + 8).toInt)
    assert(r.map(_.getLong(0)).toSet === Set(2L, 3L))
    // every reject carries the decode error detail, never a crash
    assert(r.forall(row => Option(row.getAs[String]("decode_error"))
      .exists(_.nonEmpty)))
  }

  test("dfCapFor scales the jaccard df cap with corpus size (fixed cap = recall cliff)") {
    // sf0.1-sized corpus keeps the declared q22 cap of 20
    assert(TextDedup.dfCapFor(5000) === 20)
    // tiny corpora floor at 20 rather than over-pruning
    assert(TextDedup.dfCapFor(100) === 20)
    // 10× corpus → 10× cap: cap/corpus stays constant, so the SCALE_r8
    // replication scenario keeps its pairs instead of pruning to zero
    assert(TextDedup.dfCapFor(50000) === 200)
    assert(TextDedup.dfCapFor(50000, perMille = 2.0) === 100)
  }

  test("real WAV decode: generated square waves round-trip through javax.sound") {
    import spark.implicits._
    val ids = Seq(0L, 7L, 99L, 123L).toDF("doc_id")
    val feats = Multimodal.audioFeatures(Multimodal.wavPayloadFromId(ids))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet === Set(0L, 7L, 99L, 123L))
    for ((id, f) <- feats) {
      val rate = 8000 + (id % 8) * 1000
      val n = 400 + (id % 100) * 20
      assert(f.sample_rate === rate.toInt, s"rate for id=$id")
      assert(f.n_samples === n, s"n for id=$id")
      assert(f.n_bytes === 44 + 2 * n, s"bytes for id=$id")
      // a square wave's RMS is exactly its amplitude
      assert(f.rms === (1000 + (id % 30) * 500).toDouble, s"rms for id=$id")
      assert(f.duration_ms === math.rint(n * 1000.0 / rate * 10000) / 10000)
    }
  }

  test("corrupt audio dead-letters: truncated WAV and junk route to rejects") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val good = Multimodal.wavPayloadFromId(ids).collect()
    val corrupted = good.map { m =>
      m.media_id match {
        case 2L => m.copy(payload = m.payload.take(20))            // truncated header
        case 3L => m.copy(payload = "junk, not audio".getBytes)    // wrong container
        case _  => m
      }
    }.toSeq.toDS()
    val (valid, rejects, decoded) = Multimodal.audioFeaturesOrReject(corrupted)
    decoded.persist()
    val v = valid.collect()
    val r = rejects.collect()
    decoded.unpersist()
    assert(v.map(_.getLong(0)).toSet === Set(1L))
    assert(r.map(_.getLong(0)).toSet === Set(2L, 3L))
    assert(r.forall(row => Option(row.getAs[String]("decode_error"))
      .exists(_.nonEmpty)))
  }

  test("pmiCollocations: always-paired bigram outranks the reversed pair, exact values") {
    // one doc "a b a b a b": bigrams ab×3 ba×2, unigrams a×3 b×3, N=6 Nb=5
    val in = Seq("a b a b a b").toDF("text")
    val out = TermWeighting.pmiCollocations(in, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(out.length === 2)
    val Seq(first, second) = out.sortBy(_._5).toSeq
    assert((first._1, first._2, first._3) === (("a", "b", 3L)))
    val expPmi = math.log((3.0 / 5) / ((3.0 / 6) * (3.0 / 6)))
    assert(math.abs(first._4 - math.floor(expPmi * 1e4 + 0.5) / 1e4) < 1e-9)
    assert((second._1, second._2, second._3) === (("b", "a", 2L)))
  }

  test("pmiCollocations: pairs below minCount are dropped") {
    // bigrams: xy×1, pq×2, qp×1 — only pq survives minCount=2
    val in = Seq("x y", "p q p q").toDF("text")
    val pairs = TermWeighting.pmiCollocations(in, minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("p", "q")))
  }

  test("pmiCollocations: fused unit stream equals the two-pass formulation on real docs") {
    import graft.functions.TextFunctions.tokensFast
    // the pre-round-20 shape, inline: separate bigram and unigram passes
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(filter(tokensFast(col("text")), t => t =!= "").as("__t"))
    val bigStructs = transform(sequence(lit(1), size(col("__t")) - 1),
      i => struct(element_at(col("__t"), i).as("w1"),
        element_at(col("__t"), i + 1).as("w2")))
    val big = toks.select(
      explode(when(size(col("__t")) >= 2, bigStructs)
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val nb = c2.agg(sum("c2").as("__nb"))
    val cw = toks.select(explode(when(size(col("__t")) >= 0, col("__t"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val n = cw.agg(sum("cw").as("__n"))
    val pmi = log((col("c2").cast("double") / col("__nb")) /
      ((col("cw1").cast("double") / col("__n")) *
        (col("cw2").cast("double") / col("__n"))))
    val scored = c2.filter(col("c2") >= 5)
      .join(broadcast(cw.select(col("w").as("w1"), col("cw").as("cw1"))), "w1")
      .join(broadcast(cw.select(col("w").as("w2"), col("cw").as("cw2"))), "w2")
      .crossJoin(broadcast(n)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c2"), round(pmi, 4).as("pmi"))
    val rkw = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
    val want = scored.orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(50).withColumn("rk", row_number().over(rkw).cast("long"))
      .collect().map(_.toSeq)
    val got = TermWeighting.pmiCollocations(docs).collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("oovRate: matches a naive recomputation of the same hash split") {
    val in = (1L to 40L).map(i => (i, s"tok$i shared tok${i % 7}"))
      .toDF("doc_id", "text")
    val out = TermWeighting.oovRate(in).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // recompute the split with the SAME engine-portable unit
    val us = in.select(col("doc_id"),
        Sampling.hashUnit("graft", col("doc_id")).as("u"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val texts = (1L to 40L).map(i => i -> s"tok$i shared tok${i % 7}").toMap
    val vocab = texts.collect { case (id, t) if us(id) < 0.8 => t }
      .flatMap(_.split(" ")).toSet
    val held = texts.filter { case (id, _) => us(id) >= 0.8 }
    assert(held.nonEmpty && out.keySet === held.keySet)
    held.foreach { case (id, t) =>
      val toks = t.split(" ")
      val expOov = toks.count(w => !vocab.contains(w))
      assert(out(id) === ((toks.length.toLong, expOov.toLong)),
        s"doc $id: got ${out(id)} want (${toks.length}, $expOov)")
    }
  }

  test("oovRate: driver vocab-set path == join path cell-for-cell (cap 0 vs default)") {
    // real corpus docs so the tokenizer kernel sees punctuation/unicode,
    // plus the synthetic frame above for the split edge
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val synth = (1L to 40L).map(i => (i, s"tok$i shared tok${i % 7}"))
      .toDF("doc_id", "text")
    for (in <- Seq(docs, synth)) {
      val withSet = TermWeighting.oovRate(in)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
      spark.conf.set("graft.vocab.maxDriverTerms", "0")
      val withJoin =
        try TermWeighting.oovRate(in).orderBy("doc_id").collect().map(_.toSeq).toSeq
        finally spark.conf.unset("graft.vocab.maxDriverTerms")
      assert(withSet === withJoin)
      assert(withSet.nonEmpty)
    }
  }

  test("keepBestByScore: highest score wins, score ties break to the smaller id") {
    val groups = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 200L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1))
      .toDF("doc_id", "quality_score")
    val out = Dedup.keepBestByScore(groups, scores).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(100L) === ((3L, 2L, 0.9))) // tie 0.9: doc 2 beats doc 3
    assert(out(200L) === ((1L, 4L, 0.1)))
  }

  test("assignToCentroids: nearest wins, exact dist2, ties break to the smaller index") {
    val in = Seq(
      (1L, Seq(0f, 0f)),  // centroid 0
      (2L, Seq(2f, 0f)),  // centroid 1
      (10L, Seq(0.4f, 0f)),  // nearest: centroid 0, dist2 = 0.16
      (11L, Seq(1.9f, 1f)),  // nearest: centroid 1, dist2 = 0.01+1
      (12L, Seq(1f, 0f))     // exact tie (dist2 1.0 both) → first wins = 0
    ).toDF("vec_id", "embedding")
    val out = Clustering.assignToCentroids(in, Seq(1L, 2L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) === ((0L, 0.0)) && out(2L) === ((1L, 0.0)))
    assert(out(10L)._1 === 0L && math.abs(out(10L)._2 - 0.16) < 1e-9)
    assert(out(11L)._1 === 1L)
    assert(out(12L) === ((0L, 1.0)))
  }
}
