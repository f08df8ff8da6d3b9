package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Benchmark main. Prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`
  * where `queries` carries the per-query MEDIAN of the timed passes and
  * `value` is the sum of SUCCESSFUL medians (failed queries report a `-1.0`
  * sentinel median, are excluded from the total, and are named in the
  * top-level `failed` array — see [[totalOf]]/[[failedOf]]).
  *
  * Methodology (round-3 lesson: min-of-2 could not tell a 47% regression
  * from VM noise; round-6 lesson: median-of-3 with a cold first pass
  * couldn't either — 10s spreads on 4s medians):
  *  - WARM protocol: every query runs ONE untimed warm-up pass before the
  *    timed passes. The warm-up absorbs first-run codegen/JIT/FS-metadata
  *    cost and any pay-once build the query owns (ANN index, bucketed
  *    layout); its duration is still published as `queries_cold`.
  *  - median of `SPARK_GRAFT_BENCH_RUNS` (default 3) timed passes; if the
  *    spread (max−min) still exceeds the median, extra passes run up to
  *    `SPARK_GRAFT_BENCH_MAX_RUNS` (default 7) total — variance has to be
  *    beaten by evidence, not hoped away.
  *  - passes are INTERLEAVED round-robin across queries (pass 1 of every
  *    query, then pass 2 of every query, …), not query-at-a-time
  *    (round-7 lesson: a noisy-neighbor window that overlaps one query's
  *    whole back-to-back pass block poisons ALL of its passes — q78's
  *    driver-window median read 22.3s against a 5.9s min. Interleaving
  *    spreads any degraded window thinly across every query's sample
  *    set instead of concentrating it in one query's median);
  *  - a cheap fixed calibration probe runs between rounds and is
  *    published as `calibration_passes`, so each pass index carries its
  *    own VM-speed reading;
  *  - per-query `window_ok` flag: false when the adaptive rerun cap was
  *    hit with spread still > median (or the query failed) — a reader
  *    can mechanically reject that median as window-degraded instead of
  *    trusting it;
  *  - `queries_min` / `queries_spread` published alongside, so a
  *    cross-round delta can be judged against the measured same-run spread:
  *    a delta inside the spread is noise, not a regression;
  *  - pay-once builds are reported SEPARATELY (`ann_build`: the persisted
  *    index store is wiped, so the warm-up pass IS the build;
  *    `layout_build`: q87's bucketed-table write, same treatment) —
  *    "build once, query many" measured as such.
  * The DuckDB side of the comparison is persisted by
  * `tools/bench_duckdb.py` to `target/bench_duckdb_<sf>.json` (scale-suffixed,
  * like this main's own `target/bench_<sf>.json`) — committed per round so
  * the spark-vs-duck ratio is an artifact, not a one-window claim.
  */
object Bench {
  /** Headline total = sum of SUCCESSFUL medians only. Failed queries carry a
    * `-1.0` sentinel; summing those would let a crashed query LOWER the
    * published total (round-10 shipped 88.66s for 92.66s of successful work
    * plus four crashes). A failure must never improve the headline — it is
    * excluded here and named in the artifact's `failed` list instead. */
  private[graft] def totalOf(medians: Iterable[Double]): Double =
    medians.filter(_ >= 0).sum

  /** Queries whose median is the failure sentinel, sorted for stable JSON. */
  private[graft] def failedOf(medians: Map[String, Double]): Seq[String] =
    medians.collect { case (n, m) if m < 0 => n }.toSeq.sorted

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM JIT, codegen pipeline, FS metadata) so per-query
    // timings reflect steady-state execution rather than first-query startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    // Fixed calibration workload (same every round, data-independent): the
    // VM is shared and noisy-neighbor windows inflate EVERY timing for
    // minutes at a stretch — identical code has measured 29.7s..40.1s
    // totals an hour apart. start/end calibration numbers let a reader
    // normalize a round's total by how slow the VM was in that window
    // before calling a cross-round delta a regression.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(20000000L).selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k").sum("v").count()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // warm the calibration path itself
    val calStart = calibrate()

    def timeOnce(name: String,
                 fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        // noop write, not count(): count() lets Catalyst PRUNE work a real
        // consumer would pay — it eliminated q101's entire gram pipeline
        // through left-join elimination (the join's right side is an
        // aggregate, provably unique per key, and no column of it survives
        // into count), timing a 2.4s query at 0.17s. The noop sink
        // materializes every output column, which is also what the DuckDB
        // side (fetchall) pays — the only apples-to-apples action.
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches a query may have pinned (outside its timing) so later
      // queries aren't measured under accumulated heap pressure
      spark.catalog.clearCache()
      // a failed run must not masquerade as a fast timing: report -1
      if (ok) dt else -1.0
    }

    // optional focus list for local iteration: comma-separated query names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(q => f(q._1)))

    // ANN queries persist their index; wipe the store so their warm-up
    // pass is the (separately reported) build and the timed passes are
    // pure probes. Honors the focus filter — a focused non-ANN run must
    // not wipe (and rebuild) the persisted indexes it never measures.
    val annQueries = Seq("q25_ann_topk", "q36_ivf_topk")
      .filter(selected.contains)
    if (annQueries.nonEmpty)
      graft.util.Fs.deleteRecursively(
        s"${sys.props("java.io.tmpdir")}/graft-index",
        spark.sparkContext.hadoopConfiguration)
    // q87/q02 build their bucketed tables on first call per JVM — the
    // warm-up pass is the layout build, the timed passes the co-located
    // join (pay-once layout measured as such).
    val layoutQueries = Seq("q87_bucketed_join", "q02_revenue_by_nation")
      .filter(selected.contains)

    val maxRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "7").toInt
    final case class Timing(median: Double, min: Double, spread: Double,
                            cold: Double, windowOk: Boolean)
    // conventional median: mean of the two middle elements for even n (an
    // upper-middle pick would bias even-length pass lists high by up to
    // one inter-pass gap)
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    def spreadBad(xs: Seq[Double]) = (xs.max - xs.min) > med(xs)
    val names = selected.keys.toVector
    // round 0: every query's untimed warm-up (build pass for ANN/layout)
    val cold = names.map(n => n -> timeOnce(n, selected(n))).toMap
    val passes = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefault(_ => Vector.empty)
    val calPasses = scala.collection.mutable.ArrayBuffer[Double]()
    def failed(n: String) = cold(n) < 0 || passes(n).exists(_ < 0)
    // interleaved base rounds, then interleaved adaptive rounds over the
    // still-noisy subset — never the same query back-to-back
    var round = 0
    var active = names.filter(!failed(_))
    while (active.nonEmpty && round < maxRuns) {
      calPasses += calibrate()
      for (n <- active) passes(n) = passes(n) :+ timeOnce(n, selected(n))
      round += 1
      active = names.filter(n => !failed(n) &&
        (round < runs || (passes(n).length < maxRuns && spreadBad(passes(n)))))
    }
    calPasses += calibrate()
    val results = names.map { n =>
      val p = passes(n)
      n -> (if (failed(n) || p.isEmpty)
              Timing(-1.0, -1.0, -1.0, -1.0, windowOk = false)
            else
              Timing(med(p), p.min, p.max - p.min, cold(n),
                windowOk = !spreadBad(p)))
    }.toMap
    val annBuild = annQueries.map(n => n -> results(n).cold).toMap
    val layoutBuild = layoutQueries.map(n => n -> results(n).cold).toMap

    // ANN quality as a published artifact (round-8 verdict ask): recall@10
    // of each approximate index against the brute-force q23 ground truth
    // on the same probe vector, plus the probe-cell configs — so index
    // quality is a trendable number per round, not just a spec assertion.
    val annQuality: Map[String, Double] =
      if (annQueries.nonEmpty) {
        def ids(name: String): Set[Long] =
          SparkEntry.queries(name)(spark, sfDir)
            .select("vec_id").collect().map(_.getLong(0)).toSet
        try {
          val truth = ids("q23_embedding_topk")
          val corpusRecall = annQueries.map { n =>
            s"${n}_recall_at_10" ->
              ids(n).intersect(truth).size.toDouble / truth.size
          }.toMap
          // Planted-neighbor recall — the promise an ANN index actually
          // makes. The corpus recall above is bounded by the DATA, not
          // the index: i.i.d. gaussian embeddings have near-orthogonal
          // "nearest" neighbors (max pairwise cos ≈ 0.5) that no LSH can
          // bucket, so it trends low by construction. The fixture is
          // SHARED with the in-query hard gates (ExtQueries.plantedGate) —
          // this section publishes the trend number, the gates enforce it.
          import graft.operators.Similarity
          val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
          val (corpus, v0, plantedIds) = ExtQueries.plantedFixture(spark, sfDir)
          val probe = emb.filter(col("vec_id") === 0)
            .select(col("embedding").as("qv"))
          val lsh = Similarity.SignLsh(nBits = ExtQueries.AnnLshBits, dim = 64,
            nTables = ExtQueries.AnnLshTables)
          // same corpus-size-adaptive probe depth as the declared query
          val probeH = ExtQueries.annLshProbeHFor(
            emb.filter(col("vec_id") =!= 0).count())
          val lshFound = lsh.topK(lsh.index(corpus), probe, 10,
              probeHamming = probeH)
            .collect().map(_.getLong(0)).toSet
          // same corpus-size-adaptive config as the declared q36 (round-19)
          val ivfNc = ExtQueries.ivfCentroidsFor(
            emb.filter(col("vec_id") =!= 0).count())
          val ivfNp = ExtQueries.ivfProbeFor(ivfNc)
          val ivf = Similarity.Ivf(ivfNc, ivfNp, exact = true)
          val (centers, index) = ivf.build(corpus)
          val ivfFound = ivf.topK(centers, index, probe, 10)
            .collect().map(_.getLong(0)).toSet
          // luck-proof IVF trend number (round-18): single-query recall
          // swings 0.3–0.8 across equally-valid inits on isotropic data —
          // the MEAN over 20 query vectors is stable (0.56–0.60 for both
          // the float and exact trainers at sf0.1/sf1)
          val ivfIdx = index.persist()
          val ivfMean20 = try {
            (1L to 20L).map { qid =>
              val qv = emb.filter(col("vec_id") === qid)
                .select(col("embedding").as("qv"))
              val tr = Similarity.bruteForceTopK(
                  corpus.filter(col("vec_id") =!= qid), qv, 10)
                .collect().map(_.getLong(0)).toSet
              val fd = ivf.topK(centers,
                  ivfIdx.filter(col("vec_id") =!= qid), qv, 10)
                .collect().map(_.getLong(0)).toSet
              fd.intersect(tr).size / 10.0
            }.sum / 20.0
          } finally { ivfIdx.unpersist(): Unit }
          // the cost side of the published recall: fraction of the REAL
          // corpus the default probe set re-scores (recall without scan
          // fraction is half a number — brute force has recall 1.0)
          val corpusReal = emb.filter(col("vec_id") =!= 0)
            .select(col("vec_id"), col("embedding"))
          val scanFrac = lsh.candidateFraction(lsh.index(corpusReal),
            ExtQueries.plantedFixture(spark, sfDir)._2.map(_.toDouble),
            probeHamming = probeH)
          val pq = Similarity.Pq(m = ExtQueries.PqM, nCodes = ExtQueries.PqCodes,
            exact = true)
          val cbP = pq.train(corpus)
          val pqShortlist = ExtQueries.pqShortlistFor(corpus.count())
          val pqFound = pq.topK(cbP, pq.encode(cbP, corpus), corpus,
              v0.map(_.toDouble), 10, shortlist = pqShortlist)
            .collect().map(_.getLong(0)).toSet
          // the cost side of PQ's published recall: the exact re-rank
          // touches shortlist/N of the corpus (the ADC pass reads only
          // the m-byte codes — the compressed representation, not a scan)
          val pqScanFrac = pqShortlist.toDouble / corpusReal.count()
          corpusRecall ++ Map(
            "q98_pq_topk_recall_at_10" ->
              ids("q98_pq_topk").intersect(truth).size.toDouble / truth.size,
            "q98_planted_recall_at_5" ->
              pqFound.intersect(plantedIds).size.toDouble / 5,
            "q98_shortlist" -> pqShortlist.toDouble,
            "q98_scan_frac" -> pqScanFrac,
            "q25_scan_frac" -> scanFrac,
            "q25_planted_recall_at_5" ->
              lshFound.intersect(plantedIds).size.toDouble / 5,
            "q36_planted_recall_at_5" ->
              ivfFound.intersect(plantedIds).size.toDouble / 5,
            "q36_mean20_recall_at_10" -> ivfMean20,
            "q25_lsh_bits" -> ExtQueries.AnnLshBits.toDouble,
            "q25_lsh_tables" -> ExtQueries.AnnLshTables.toDouble,
            "q25_probe_hamming" -> probeH.toDouble,
            "q36_ivf_centroids" -> ivfNc.toDouble,
            "q36_probe_cells" -> ivfNp.toDouble,
            "q36_scan_frac" -> ivfNp.toDouble / ivfNc)
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] ann_quality failed: ${e.getMessage}")
          Map.empty[String, Double]
        }
      } else Map.empty

    val calEnd = calibrate()

    // Locale.ROOT: the f interpolator honors the JVM default locale, and a
    // comma-decimal locale would emit malformed JSON
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", v)
    def jsonMap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val medians = results.map { case (k, t) => k -> t.median }
    val total = totalOf(medians.values)
    val failedList = failedOf(medians)
    val aux =
      s""","queries_min":${jsonMap(results.map { case (k, t) => k -> t.min })}""" +
      s""","queries_spread":${jsonMap(results.map { case (k, t) => k -> t.spread })}""" +
      s""","queries_cold":${jsonMap(results.map { case (k, t) => k -> t.cold })}""" +
      s""","queries_window_ok":${results.map { case (k, t) =>
             "\"" + k + "\":" + t.windowOk }.mkString("{", ",", "}")}""" +
      s""","ann_build":${jsonMap(annBuild)}""" +
      s""","layout_build":${jsonMap(layoutBuild)}""" +
      s""","calibration_passes":${calPasses.map(num).mkString("[", ",", "]")}"""
    def body(withAux: Boolean): String =
      s"""{"metric":"total","value":$total,"unit":"sec"""" +
      s""","failed":${failedList.map("\"" + _ + "\"").mkString("[", ",", "]")}""" +
      s""","queries":${jsonMap(results.map { case (k, t) => k -> t.median })}""" +
      s""","ann_quality":${jsonMap(annQuality)}""" +
      (if (withAux) aux else "") +
      s""","calibration_start":${num(calStart)},"calibration_end":${num(calEnd)}""" +
      s""","runs":$runs,"sf":"$sfDir"}"""
    // stdout gets the COMPACT line (~4 KB: headline, failed, per-query
    // medians, ann_quality): the driver's stdout capture truncates around
    // 16 KB and the full object is ~18 KB, which is how every BENCH_rN.json
    // through r11 ended up with `"parsed": null` and a mid-JSON tail. The
    // FULL object — aux maps (min/spread/cold/window_ok, build costs,
    // calibration passes) included — goes to a SCALE-SUFFIXED file
    // (`target/bench_sf01.json` for sf0.1, `bench_sf1.json`, …): r12
    // committed an sf1 bench.json and then an sf0.1 run silently overwrote
    // it in the working tree, leaving the committed artifact and the round
    // report describing different runs. One path per scale factor makes
    // that race structurally impossible (r12 verdict #4).
    println(body(withAux = false))
    val sfLabel = new java.io.File(sfDir).getName.replace(".", "")
    // Truncation-proof headline, printed LAST (r13 verdict #6): the
    // driver's stdout capture truncates long output from the FRONT, so
    // only the tail survives — this ~200-byte line carries the numbers a
    // reader needs (total, n, ratio) even when the compact JSON above is
    // cut mid-object and `parsed` stays null. The ratio compares THIS
    // window's medians against the committed DuckDB artifact for the same
    // scale factor over the intersection of query names — cross-window,
    // so labeled as such; same-window pairs remain the citable numbers.
    val ratioStr = try {
      val dbPath = java.nio.file.Paths.get(s"target/bench_duckdb_$sfLabel.json")
      if (java.nio.file.Files.exists(dbPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(dbPath),
          java.nio.charset.StandardCharsets.UTF_8)
        // the artifact nests {"queries":{"name":{"median":sec,...},...}}:
        // pull name→median pairs with a regex — no JSON lib on the classpath
        val qmap = """"(q[0-9a-z_]+)"\s*:\s*\{\s*"median"\s*:\s*([0-9.]+)""".r
          .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
        val shared = medians.filter { case (k, v) => v >= 0 && qmap.contains(k) }
        val db = shared.keys.map(qmap).sum
        if (db > 0)
          s""","shared_n":${shared.size},"ratio_vs_duckdb_file":${num(shared.values.sum / db)}"""
        else ""
      } else ""
    } catch { case scala.util.control.NonFatal(_) => "" }
    println(s"""{"bench_summary":"$sfLabel","total_sec":${num(total)}""" +
      s""","n_queries":${medians.values.count(_ >= 0)},"failed":${failedList.size}""" +
      s""","calibration":[${num(calStart)},${num(calEnd)}]$ratioStr}""")
    // A focused run (SPARK_GRAFT_BENCH_ONLY) must never clobber the round
    // artifact with a subset measurement — same rule as ScaleStress's
    // SCALE_partial.json: partial evidence gets a partial-named file.
    val benchPath =
      if (only.isDefined) s"target/bench_partial_$sfLabel.json"
      else s"target/bench_$sfLabel.json"
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(java.nio.file.Paths.get(benchPath),
        (body(withAux = true) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] wrote $benchPath (full object incl. aux maps)")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $benchPath: $e")
    }
    spark.stop()
  }
}
