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

  private val langSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  test("keyness: hand-computed G2, overuse direction, zero-count sides") {
    val corpus = df(langSchema, Seq(
      Seq(1L, "en", "aa aa aa bb"),
      Seq(2L, "de", "bb bb cc cc cc cc")))
    val out = TermWeighting.keyness(corpus, "lang", "en", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).sortBy(_._1)
    // ta=4, tb=6. aa: a=3,b=0 → G2 = 2*3*ln(3/(3*4/10)) = 6*ln(2.5)
    def g2(a: Long, b: Long): Double = {
      val (ta, tb) = (4.0, 6.0)
      val x = if (a > 0) a * math.log(a / ((a + b) * ta / (ta + tb))) else 0.0
      val y = if (b > 0) b * math.log(b / ((a + b) * tb / (ta + tb))) else 0.0
      BigDecimal(2.0 * (x + y)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out === Array(
      ("aa", 3L, 0L, g2(3, 0), true),   // only in target → overused
      ("bb", 1L, 2L, g2(1, 2), false),  // rate 1/4 < 2/6 → underused
      ("cc", 0L, 4L, g2(0, 4), false))) // only in rest
  }

  test("unigramLogLoss: hand-computed NLL, common tokens score low") {
    val corpus = df(langSchema, Seq(
      Seq(1L, "en", "the the the the"), // all high-probability tokens
      Seq(2L, "en", "the rare"),
      Seq(3L, "en", "   ")))            // empty after tokenize → no row
    val out = TermWeighting.unigramLogLoss(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // N=6: p(the)=5/6, p(rare)=1/6
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nllThe = -math.log(5.0 / 6.0)
    assert(out === Array(
      (1L, 4L, r4(nllThe)),
      (2L, 2L, r4((nllThe + -math.log(1.0 / 6.0)) / 2.0))))
    assert(out(0)._3 < out(1)._3) // the repetitive-common doc is less surprising
  }

  test("bigramLogLoss: hand-computed interpolated model, short docs emit nothing") {
    val corpus = df(schema, Seq(
      Seq(1L, "a b a b"), // bigrams (a,b)x2, (b,a); tokens a,a,b,b
      Seq(2L, "a b c"),   // bigrams (a,b), (b,c)
      Seq(3L, "x")))      // 1 token: no bigrams, no row
    val out = TermWeighting.bigramLogLoss(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // corpus model: c2(a,b)=3 c2(b,a)=1 c2(b,c)=1; c1(a)=3 c1(b)=2;
    // unigrams: a=3 b=3 c=1 x=1, N=8
    def p(c2: Double, c1: Double, cw: Double) =
      0.7 * (c2 / c1) + (1.0 - 0.7) * (cw / 8.0)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = p(3, 3, 3); val pBA = p(1, 2, 3); val pBC = p(1, 2, 1)
    assert(out === Array(
      (1L, 3L, r4((2 * -math.log(pAB) + -math.log(pBA)) / 3.0)),
      (2L, 2L, r4((-math.log(pAB) + -math.log(pBC)) / 2.0))))
    // word order matters: a doc of corpus-frequent unigrams in a
    // corpus-unseen order scores MORE surprising than the same bag in a
    // corpus-frequent order — the signal q85's unigram model cannot see
    val shuffled = df(schema, Seq(
      Seq(1L, "a b a b a b a b"), Seq(2L, "a b a b a b a b"),
      Seq(3L, "b b b b a a a a")))
    val nll = TermWeighting.bigramLogLoss(shuffled).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(3L) > nll(1L))
  }

  test("bigramLogLossIndexed: persisted model is cell-identical to on-the-fly") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val path = tempDir("bigram-lm") + "/model"
    TermWeighting.bigramModelLoadOrBuild(spark, docs, path)
    // second call must be a no-op load hit (by-name docs never evaluated)
    TermWeighting.bigramModelLoadOrBuild(spark,
      sys.error("model rebuilt despite completeness marker"), path)
    val a = TermWeighting.bigramLogLossIndexed(spark, path, docs)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = TermWeighting.bigramLogLoss(docs)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("Bm25DocStats kernel: (dl, cnts) equals the token-array expression form") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokensFast
    val schema2 = StructType(Seq(StructField("text", StringType)))
    val rows = Seq(
      Seq("apple banana apple"), Seq("  apple\tbanana  "), Seq(""),
      Seq("   "), Seq(null), Seq("APPLE Apple aPPle"), // lowercasing
      Seq("über café apple"), // multi-byte UTF-8 around the matcher
      Seq("applebanana bananaapple"), // substrings must NOT match
      Seq("ab\fapple\r\nbanana"), // every ASCII ws class splits
      Seq("apple banana")) // NBSP does NOT split (one token, no hit)
    val in = df(schema2, rows)
    graft.plans.Bm25DocStats.register(spark)
    val terms = Seq("apple", "banana")
    val termArr = array(terms.map(lit): _*)
    val got = in.select(
      call_function("graft_bm25_doc_stats", col("text"), termArr).as("st"))
      .select(col("st.dl"), col("st.cnts")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0), r.getSeq[Long](1)))
    val want = in.select(filter(tokensFast(col("text")), t => t =!= "").as("t"))
      .select(size(col("t")).cast("long").as("dl"),
        transform(termArr, q => size(filter(col("t"), x => x === q)).cast("long")).as("cnts"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[Long](1)))
    // null text: kernel yields a null STRUCT (both fields null); the
    // expression form yields dl null and cnts null — same row semantics
    got.zip(want).zipWithIndex.foreach { case (((gd, gc), (wd, wc)), i) =>
      if (wd == null) assert(gd == null, s"row $i dl")
      else { assert(gd === wd, s"row $i dl"); assert(gc === wc, s"row $i cnts") }
    }
  }

  test("bm25TopDocs: hand-computed Okapi scores, non-hits absent, rank order") {
    val corpus = df(schema, Seq(
      Seq(1L, "apple apple apple"),          // dl 3, tf(apple)=3
      Seq(2L, "apple banana other"),         // dl 3, one of each query term
      Seq(3L, "banana banana banana banana"),// dl 4
      Seq(4L, "other stuff")))               // dl 2, no query terms
    val out = TermWeighting.bm25TopDocs(corpus, Seq("apple", "banana"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // N=4, avgdl=(3+3+4+2)/4=3, df(apple)=df(banana)=2 → idf=ln(1+2.5/2.5)=ln 2
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def w(tf: Long, dl: Long) = r(math.log(2.0) * (tf * (1.2 + 1.0)) /
      (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / 3.0)), 6)
    val expected = Map(
      1L -> (1L, r(w(3, 3), 4)),            // apple only
      2L -> (2L, r(w(1, 3) + w(1, 3), 4)),  // both terms, tf 1 each
      3L -> (1L, r(w(4, 4), 4)))            // banana only
    assert(out.map(t => t._1 -> (t._2, t._3)).toMap === expected)
    assert(!out.exists(_._1 == 4L))          // no query term → not scored
    // rk follows (bm25 desc, doc_id asc), 1-based dense
    val byRank = out.sortBy(_._4)
    assert(byRank.map(_._4).toSeq === (1L to out.length))
    assert(byRank.map(_._3).toSeq === byRank.map(_._3).sortBy(-_).toSeq)
  }

  test("bm25TopDocs: more on-topic doc outranks padded one; topK respected") {
    val corpus = df(schema, (1L to 30L).map { i =>
      // docs 1-10: i copies of the query term padded to constant length 40;
      // docs 11-30 dilute df so idf stays large enough that adjacent tf
      // scores differ above the round-4 grain (an all-docs-hit term has
      // idf ≈ ln(1 + 0.5/(N+0.5)) ≈ 0 and every score rounds together)
      val hits = if (i <= 10) i.toInt else 0
      Seq(i, (Seq.fill(hits)("target") ++ Seq.fill(40 - hits)("pad")).mkString(" "))
    })
    val out = TermWeighting.bm25TopDocs(corpus, Seq("target"), topK = 5).collect()
    assert(out.length === 5)
    // equal dl everywhere → score is monotone in tf → docs 10..6 in order
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 9L, 8L, 7L, 6L))
  }
}
