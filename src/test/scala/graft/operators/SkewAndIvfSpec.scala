package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewAndIvfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("saltedJoin: row parity with a plain join under heavy key skew") {
    // 10k rows on one hot key + a long tail
    val left = spark.range(10000).select(lit(1L).as("k"), col("id").as("lv"))
      .union(spark.range(100).select((col("id") + 2).as("k"), col("id").as("lv")))
    val right = Seq((1L, "hot"), (5L, "cold"), (999L, "missing-left")).toDF("k", "rv")

    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
    val salted = SkewJoin.saltedJoin(left, right, Seq("k"), saltBuckets = 8)
      .select("k", "lv", "rv")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("hotKeySaltedJoin: parity with plain join across hot and cold keys") {
    // one genuinely hot key (5k rows), a mid key above threshold, a cold
    // tail, plus an unmatched-left and unmatched-right key — both branches
    // (salted hot, plain cold) and both miss directions exercised
    val left = spark.range(5000).select(lit(1L).as("k"), col("id").as("lv"))
      .union(spark.range(200).select(lit(2L).as("k"), col("id").as("lv")))
      .union(spark.range(50).select((col("id") + 10).as("k"), col("id").as("lv")))
    val right = Seq((1L, "hot"), (2L, "warm"), (15L, "cold"), (999L, "right-only"))
      .toDF("k", "rv")

    for (jt <- Seq("inner", "left")) {
      val plain = left.join(right, Seq("k"), jt).select("k", "lv", "rv")
      val split = SkewJoin.hotKeySaltedJoin(left, right, Seq("k"),
        hotThreshold = 100, saltBuckets = 8, joinType = jt).select("k", "lv", "rv")
      assert(split.count() === plain.count(), s"joinType=$jt")
      assert(split.except(plain).count() === 0, s"joinType=$jt")
      assert(plain.except(split).count() === 0, s"joinType=$jt")
    }
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = left.join(right, Seq("k"), jt).select("k", "lv")
      val split = SkewJoin.hotKeySaltedJoin(left, right, Seq("k"),
        hotThreshold = 100, saltBuckets = 8, joinType = jt).select("k", "lv")
      assert(split.count() === plain.count(), s"joinType=$jt")
      assert(split.except(plain).count() === 0, s"joinType=$jt")
      assert(plain.except(split).count() === 0, s"joinType=$jt")
    }
  }

  test("hotKeySaltedJoin fails loudly past maxHotKeys instead of broadcasting unbounded") {
    val left = spark.range(100)
      .select((col("id") % 10).as("k"), col("id").as("lv"))
    val right = Seq((1L, "x")).toDF("k", "rv")
    val e = intercept[IllegalArgumentException] {
      SkewJoin.hotKeySaltedJoin(left, right, Seq("k"),
        hotThreshold = 1, saltBuckets = 4, maxHotKeys = 3).collect()
    }
    assert(e.getMessage.contains("hot"))
  }

  test("hotKeySaltedJoin rejects right-outer shapes") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.hotKeySaltedJoin(df, df, Seq("k"), 1, 2, joinType = "full_outer")
    }
  }

  test("hotKeySaltedJoin: cold branch keeps AQE skew splitting for a " +
    "moderately-hot key the threshold misses") {
    // two-tier skew: key 1 is hot (above hotThreshold -> salted branch),
    // key 2 is moderately hot (below the threshold -> cold branch) but
    // still skewed enough that AQE's runtime skew-join handling must
    // split its shuffle partition. The guard question (round-17 verdict):
    // does routing key 2 through the plain cold join PRESERVE that AQE
    // rescue, or does the split-union shape disable it?
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.shuffle.partitions", "8")

      val left = spark.range(6000).select(lit(1L).as("k"), col("id").as("lv"))
        .union(spark.range(5000).select(lit(2L).as("k"), col("id").as("lv")))
        .union(spark.range(64).select((col("id") + 10).as("k"), col("id").as("lv")))
      val right = Seq((1L, "hot"), (2L, "warm"), (15L, "cold")).toDF("k", "rv")

      val split = SkewJoin.hotKeySaltedJoin(left, right, Seq("k"),
        hotThreshold = 5500, saltBuckets = 8).select("k", "lv", "rv")
      val n = split.count()
      assert(n === left.join(right, Seq("k")).count())

      // executed adaptive plan: the hot branch carries the salt column;
      // the cold branch's shuffle join was skew-split by AQE at runtime
      val collected = split.queryExecution
      collected.executedPlan.execute() // no-op if already materialized
      val planStr = collected.executedPlan.toString
      assert(planStr.contains("__graft_salt"),
        "hot branch lost its salt — split-union shape changed")
      assert(planStr.contains("skew=true"),
        s"cold branch's moderately-hot key was NOT skew-split by AQE:\n$planStr")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("saltedJoin spreads the hot key across buckets") {
    val left = spark.range(1000).select(lit(1L).as("k"), col("id").as("lv"))
    val salted = left.withColumn("__graft_salt",
      pmod(hash(left.columns.map(col): _*), lit(8)))
    assert(salted.select("__graft_salt").distinct().count() === 8)
  }

  test("IVF retrieves planted near-duplicates through probed cells") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v0 = emb.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray
    val planted = (1 to 5).map { p =>
      (9000L + p, v0.zipWithIndex.map { case (x, d) =>
        x * (1.0f + 0.02f * p * ((d % 3) - 1)) })
    }
    val corpus = emb.filter($"vec_id" =!= 0).select($"vec_id", $"embedding")
      .union(planted.toDF("vec_id", "embedding"))
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))

    val ivf = Similarity.Ivf(nCentroids = 8, nProbe = 2)
    val (centers, index) = ivf.build(corpus)
    assert(centers.length === 8)
    val top = ivf.topK(centers, index, q, k = 10).collect()
    val found = top.map(_.getLong(0)).toSet intersect planted.map(_._1).toSet
    info(s"IVF found ${found.size}/5 planted near-dups")
    assert(found.size === 5) // near-identical vectors share the query's cell
    // probing fewer cells scanned less than the full corpus
    val probedRows = index.filter($"centroid_id".isin(
      centers.zipWithIndex.map { case (c, i) =>
        val qn = v0.map(_.toDouble)
        val n = math.sqrt(qn.map(x => x * x).sum)
        (i, c.zip(qn.map(_ / n)).map { case (a, b) => a * b }.sum)
      }.sortBy(-_._2).take(2).map(_._1).toSeq: _*)).count()
    assert(probedRows < corpus.count())
  }

  test("exact IVF: micro-unit centers, deterministic training, planted recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v0 = emb.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray
    val planted = (1 to 5).map { p =>
      (9000L + p, v0.zipWithIndex.map { case (x, d) =>
        x * (1.0f + 0.02f * p * ((d % 3) - 1)) })
    }
    val corpus = emb.filter($"vec_id" =!= 0).select($"vec_id", $"embedding")
      .union(planted.toDF("vec_id", "embedding"))
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))

    val ivf = Similarity.Ivf(nCentroids = 8, nProbe = 2, exact = true)
    val (centers, index) = ivf.build(corpus)
    // centroid state is integer micro-units: every element round-trips
    // through its BIGINT form exactly (x == round(x·1e6)/1e6 — the same
    // IEEE division the DuckDB replay performs on the same integer)
    assert(centers.flatten.forall(x =>
      math.rint(x * 1e6).toLong / 1e6 == x))
    // training is a pure function of the corpus (md5 init, no RNG)
    val (centers2, _) = ivf.build(corpus)
    assert(centers.map(_.toSeq).toSeq === centers2.map(_.toSeq).toSeq)
    // quantized cells retrieve the planted near-duplicates like float IVF
    val found = ivf.topK(centers, index, q, k = 10).collect()
      .map(_.getLong(0)).toSet intersect planted.map(_._1).toSet
    assert(found.size === 5)
  }
}
