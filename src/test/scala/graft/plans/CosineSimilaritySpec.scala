package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.VectorFunctions

class CosineSimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native expression is bit-identical to the higher-order formulation") {
    CosineSimilarity.register(spark)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val scored = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id",
        VectorFunctions.cosineSimilarity($"embedding", $"qv").as("hof"),
        VectorFunctions.cosineSimilarityNative($"embedding", $"qv").as("native"))
      .collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      // exact bit equality, not approximate: same accumulation order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"mismatch at vec_id=${r.getLong(0)}")
    }
  }

  test("native expression works from SQL and survives codegen") {
    CosineSimilarity.register(spark)
    val out = spark.sql(
      "SELECT graft_cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(out.getDouble(0) === 1.0)
    val ortho = spark.sql(
      "SELECT graft_cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").head()
    assert(ortho.getDouble(0) === 0.0)
  }

  test("float arrays read natively are bit-identical to the transform-cast form") {
    CosineSimilarity.register(spark)
    val q = emb.filter($"vec_id" === 1).select($"embedding".as("qv"))
    val toD = VectorFunctions.toDoubleArray _
    val scored = emb.filter($"vec_id" =!= 1).crossJoin(broadcast(q))
      .select($"vec_id",
        // raw array<float> both sides (the round-20 fast path)
        call_function("graft_cosine_sim", $"embedding", $"qv").as("ff"),
        // pre-cast array<double> both sides (the old shape)
        call_function("graft_cosine_sim", toD($"embedding"), toD($"qv")).as("dd"),
        // mixed: float left, double right
        call_function("graft_cosine_sim", $"embedding", toD($"qv")).as("fd"))
      .collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      val bits = (i: Int) => java.lang.Double.doubleToLongBits(r.getDouble(i))
      assert(bits(1) === bits(2) && bits(1) === bits(3),
        s"mismatch at vec_id=${r.getLong(0)}")
    }
  }

  test("null array input yields null") {
    CosineSimilarity.register(spark)
    val out = spark.sql(
      "SELECT graft_cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").head()
    assert(out.isNullAt(0))
  }

  test("null ELEMENT yields null in both formulations (rewrite-safety contract)") {
    CosineSimilarity.register(spark)
    val row = spark.sql(
        "SELECT array(1.0d, CAST(NULL AS DOUBLE)) AS a, array(1.0d, 2.0d) AS b")
      .select(
        VectorFunctions.cosineSimilarity($"a", $"b").as("hof"),
        VectorFunctions.cosineSimilarityNative($"a", $"b").as("native"))
      .head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("RewriteHofCosine: the declarative HOF pattern optimizes to the fused kernel") {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteHofCosine
    try {
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      val df = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
        .select($"vec_id",
          VectorFunctions.cosineSimilarity($"embedding", $"qv").as("cos"))
      // the optimizer replaced the aggregate/zip_with trees with the kernel
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_cosine_sim"), optimized)
      assert(!optimized.contains("aggregate("), optimized)

      // and the rewritten plan computes the HOF answer bit-for-bit
      spark.experimental.extraOptimizations = prev // HOF plan for comparison
      val hof = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.experimental.extraOptimizations = prev :+ RewriteHofCosine
      val rewritten = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rewritten.keySet === hof.keySet)
      rewritten.foreach { case (id, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ===
          java.lang.Double.doubleToLongBits(hof(id)), s"vec_id=$id")
      }
    } finally spark.experimental.extraOptimizations = prev
  }

  test("RewriteHofCosine does NOT fire on near-miss folds (x*x numerator)") {
    import org.apache.spark.sql.Column
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteHofCosine
    try {
      // same tree shape but the zip lambda squares its FIRST param — a
      // genuinely different computation that must survive unrewritten
      def dotXX(a: Column, b: Column) = aggregate(
        zip_with(VectorFunctions.toDoubleArray(a),
          VectorFunctions.toDoubleArray(b), (x, _) => x * x),
        lit(0.0), (acc, v) => acc + v)
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      val df = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
        .select((dotXX($"embedding", $"qv") /
          (sqrt(dotXX($"embedding", $"embedding")) * sqrt(dotXX($"qv", $"qv"))))
          .as("not_cos"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("graft_cosine_sim"), optimized)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("length-mismatched arrays yield null, matching the HOF formulation") {
    CosineSimilarity.register(spark)
    // codegen path
    val sqlOut = spark.sql(
      "SELECT graft_cosine_sim(array(1.0d, 2.0d), array(1.0d)) AS c").head()
    assert(sqlOut.isNullAt(0))
    // both formulations side by side on mismatched input
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
      .select(
        VectorFunctions.cosineSimilarity($"a", $"b").as("hof"),
        VectorFunctions.cosineSimilarityNative($"a", $"b").as("native"))
      .head()
    assert(df.isNullAt(0) && df.isNullAt(1))
  }
}
