package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Differential specs for the round-8 rewrites: the optimized distributed
  * plans must agree EXACTLY with naive in-memory reference implementations
  * on randomized corpora (seeded — failures reproduce). These guard the
  * algebraic claims the rewrites rest on:
  *  - q22 bucket pair emission == the df-capped shared-shingle join it
  *    replaced (each unordered pair counted once per shared in-cap
  *    shingle; sizes from distinct-shingle counts);
  *  - q21 chunk-pigeonhole candidate generation has EXACT recall at
  *    Hamming ≤ 3 (any such pair shares one of 4 chunks).
  */
class TextDedupDifferentialSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Seeded corpus: small vocab (forces shared shingles and df-cap hits),
    * planted near-dup pairs (forces jaccard ≥ 0.5 rows). */
  private def corpus(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val base = (0 until n).map { i =>
      val len = 5 + rnd.nextInt(25)
      i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // plant near-dups: copies with one word appended
    val dups = (0 until n / 5).map { i =>
      (1000L + i) -> (base(rnd.nextInt(n))._2 + " " + vocab(rnd.nextInt(vocab.size)))
    }
    base ++ dups
  }

  private def shingleSet(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    if (toks.size < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("ngramJaccardPairs == naive df-capped jaccard on random corpora") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val docs = corpus(seed, 60)
      val cap = 20
      val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      val df = sh.values.flatten.groupBy(identity).map { case (s, o) => s -> o.size }
      val ids = docs.map(_._1)
      val expected = (for {
        a <- ids; b <- ids if a < b
        inter = (sh(a) intersect sh(b)).count(s => df(s) >= 2 && df(s) <= cap)
        if inter > 0
        j = math.rint(inter.toDouble / (sh(a).size + sh(b).size - inter) * 10000) / 10000
        if j >= 0.5
      } yield (a, b, j)).toSet

      val got = TextDedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          maxShingleDf = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"seed=$seed")
      assert(expected.nonEmpty, s"seed=$seed planted no pairs — weak test")
    }
  }

  test("graft_hash60 kernel == md5-hex-conv expression form, bit-identical " +
    "(the value contract every hashed-gram oracle rests on)") {
    graft.plans.Hash60.register(spark)
    val strs = (1 to 300).map(i => s"tok$i gram ${i * 7} x") ++
      Seq("", "a", "é ü 中文 🙂", " leading space", "two  spaces")
    val out = strs.toDF("s").select(
      graft.functions.TextFunctions.hash60Fast(org.apache.spark.sql.functions.col("s")).as("k"),
      graft.functions.TextFunctions.hash60(org.apache.spark.sql.functions.col("s")).as("e"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("graft_ngram_hash60 kernel == transform(positionalShingles, hash60) " +
    "for n in 1..4 (incl. short docs and unicode)") {
    import org.apache.spark.sql.functions.{col, transform => htransform}
    import graft.functions.TextFunctions
    graft.plans.NgramHash60.register(spark)
    val texts = Seq("one two three four five", "solo", "a b", "",
      "é ü 中文 🙂 mixed bytes here", "x " * 50)
    val toked = texts.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
    for (n <- 1 to 4) {
      val rows = toked.select(
        TextFunctions.ngramHash60(col("t"), n).as("k"),
        htransform(TextFunctions.positionalShinglesFromTokens(col("t"), n),
          s => TextFunctions.hash60(s)).as("e")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("graft_winnow_hash60 kernel == winnow(transform(shingles, hash60)) " +
    "(order-preserving first-occurrence dedup, short-input rule)") {
    import org.apache.spark.sql.functions.{col, lit, call_function, transform => htransform}
    import graft.functions.TextFunctions
    graft.plans.WinnowHash60.register(spark)
    val texts = Seq("one two three four five six seven eight", "a b c",
      "a b c d e", "", "solo", "x " * 40, "é ü 中文 🙂 bytes here now ok")
    val toked = texts.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
    val rows = toked.select(
      call_function("graft_winnow_hash60", col("t"), lit(3), lit(4)).as("k"),
      TextFunctions.winnow(
        htransform(TextFunctions.positionalShinglesFromTokens(col("t"), 3),
          s => TextFunctions.hash60(s)), 4).as("e")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("graft_simhash60 kernel == explode + per-bit SUM(±1) aggregate twin " +
    "(the value contract the q21 oracle rests on)") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    graft.plans.SimHash60.register(spark)
    graft.plans.Hash60.register(spark)
    val texts = Seq("one two three four five", "solo", "a b a b a", "",
      "   ", "é ü 中文 🙂 mixed bytes", "x " * 50,
      "\tleading tab keeps an empty token")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val kernel = docs.select(col("doc_id"),
      call_function("graft_simhash60",
        TextFunctions.tokens(col("text"))).as("k"))
    // the aggregate twin — the pre-round-16 formulation, which is also the
    // shape the DuckDB oracle replays in SQL
    val tok = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
      .withColumn("h", TextFunctions.hash60Fast(col("tok")))
    val bitVotes = (0 until 60).map { b =>
      sum(when(expr(s"(shiftright(h, $b) & 1) = 1"), 1).otherwise(-1)).as(s"s$b")
    }
    val assembled = (0 until 60).map { b =>
      when(col(s"s$b") > 0, expr(s"shiftleft(1L, $b)")).otherwise(lit(0L))
    }.reduce(_ + _)
    val twin = tok.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"), assembled.as("e"))
    val joined = kernel.join(twin, "doc_id").collect()
    assert(joined.length === texts.length) // tokens() is never empty → twin covers all
    joined.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"doc ${r.getLong(0)}"))
  }

  test("winnowFingerprints == naive MOSS winnowing (positional shingles, window mins)") {
    def md5hex(s: String): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    // the portable 60-bit family: first 15 md5 hex chars as a long —
    // mirrors graft.functions.TextFunctions.hash60 and the SQL oracle
    def naive(text: String, w: Int): Set[Long] = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val sh = if (toks.size < 3) Seq.empty[String]
               else toks.sliding(3).map(_.mkString(" ")).toSeq
      val hs = sh.map(s => java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16))
      if (hs.size >= w) hs.sliding(w).map(_.min).toSet
      else hs.minOption.toSet
    }
    for (seed <- Seq(5L, 13L)) {
      val docs = corpus(seed, 40)
      val expected = docs.flatMap { case (id, t) =>
        naive(t, 4).map(f => id -> f) }.toSet
      val got = TextDedup.winnowFingerprints(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got === expected, s"seed=$seed")
      assert(expected.nonEmpty)
    }
  }

  test("simhashPairs == naive pairwise Hamming at distance <= 3 (exact recall)") {
    for (seed <- Seq(3L, 11L)) {
      val docs = corpus(seed, 50)
      val frame = docs.toDF("doc_id", "text")
      // signatures from the (independently oracle-verified) signature op;
      // the property under test is the PAIRING: pigeonhole candidates +
      // distinct must equal the full quadratic sweep
      val sigs = TextDedup.simhashSignatures(frame)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ids = docs.map(_._1)
      val expected = (for {
        a <- ids; b <- ids if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
        if h <= 3
      } yield (a, b, h)).toSet

      val got = TextDedup.simhashPairs(frame)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === expected, s"seed=$seed")
      assert(expected.nonEmpty, s"seed=$seed planted no pairs — weak test")
    }
  }

  test("graft_winnow_hash60 rejects w < 1 at analysis time (SQL-reachable boundary)") {
    graft.plans.WinnowHash60.register(spark)
    spark.range(1).createOrReplaceTempView("one_row")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_winnow_hash60(array('a','b','c','d'), 3, 0) FROM one_row")
        .collect()
    }
    assert(e.getMessage.contains("w must be >= 1"))
  }

  test("pair-volume guard: ngramJaccardPairs trips on ACTUAL dense buckets only") {
    // 30 identical docs: every shingle bucket holds all 30 -> 435 pairs
    val dense = spark.range(30)
      .select(col("id").as("doc_id"),
        lit("w1 w2 w3 w4 w5 w6 w7 w8").as("text"))
    val e = intercept[Exception] {
      TextDedup.ngramJaccardPairs(dense, maxShingleDf = 50,
        maxPairsPerBucket = 100L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("minhashLshGroups")))
    // the advisor's false positive (round 17): a large derived cap with NO
    // actually-dense bucket must run clean — the old driver-side require
    // on the cap's worst case hard-failed any corpus past ~158k docs
    val healthy = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z q r"))
      .toDF("doc_id", "text")
    assert(TextDedup.ngramJaccardPairs(healthy, maxShingleDf = 5000,
      maxPairsPerBucket = 1000L).count() === 1)
    // and a dense bucket under the cap passes untripped
    assert(TextDedup.ngramJaccardPairs(dense, maxShingleDf = 50,
      maxPairsPerBucket = 1000L).count() === 30L * 29 / 2)
  }

  test("pair-volume guard: simhashPairs fails loudly on a dense-duplicate bucket") {
    // 60 identical docs: every chunk bucket has 60 members -> 1770 pairs
    val dense = spark.range(60)
      .select(col("id").as("doc_id"),
        lit("same same same words words everywhere").as("text"))
    val e = intercept[Exception] {
      TextDedup.simhashPairs(dense, maxPairsPerBucket = 100L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("maxPairsPerBucket")))
    // and passes untripped at the default cap
    assert(TextDedup.simhashPairs(dense).count() === 60L * 59 / 2)
  }

  test("pair-volume guard: editDistancePairs fails loudly on a hot block") {
    val hot = spark.range(40).select(col("id").as("doc_id"),
      concat(lit("prefix text shared "), col("id").cast("string")).as("text"),
      lit("src").as("source"), lit(25).as("n_chars"))
    val e = intercept[Exception] {
      TextDedup.editDistancePairs(hot, maxPairsPerBucket = 50L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("maxPairsPerBucket")))
    assert(TextDedup.editDistancePairs(hot).count() >= 0)
  }

  test("graft_ngram_hash60 raises a descriptive error on null token elements") {
    graft.plans.NgramHash60.register(spark)
    spark.range(1).createOrReplaceTempView("one_row")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_ngram_hash60(array('a', cast(null as string), 'b'), 2) FROM one_row")
        .collect()
    }
    // root cause may be wrapped in a SparkException layer by the executor
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause).map(identity))
    assert(messages(e).exists(m => m != null && m.contains("null element")))
  }

  test("graft_pair_combinations kernel == flatten(transform(slice)) chain " +
    "(structs, primitives, short arrays)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.plans.PairCombinations.register(spark)
    // struct elements (the q22/q20 shape): sorted (doc_id, n) buckets
    val rnd = new scala.util.Random(119)
    val structDf = (1 to 60).map { i =>
      val m = rnd.nextInt(6) // 0..5 members
      (i.toLong, (1 to m).map(j => (j.toLong * i, j + i)).sorted)
    }.toDF("bucket", "raw")
      .select(col("bucket"), transform(col("raw"),
        r => struct(r.getField("_1").as("doc_id"), r.getField("_2").as("n"))).as("ids"))
    val both = structDf.select(
      call_function("graft_pair_combinations", col("ids")).as("kern"),
      flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("x"), y.as("y"))))).as("decl"))
    assert(both.filter(not(col("kern") === col("decl"))).count() === 0L)
    // primitive elements
    val prim = Seq(Seq(3L, 1L, 2L), Seq(7L), Seq.empty[Long]).toDF("a")
      .select(call_function("graft_pair_combinations", col("a")).as("kern"),
        flatten(transform(col("a"), (x, i) =>
          transform(slice(col("a"), i + lit(2), size(col("a"))),
            y => struct(x.as("x"), y.as("y"))))).as("decl"))
    assert(prim.filter(not(col("kern") === col("decl"))).count() === 0L)
  }
}
