package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** No SQL oracle can exist (gradient sums are float-order dependent), so
  * this spec is the correctness authority: separable corpora must be
  * learned, scoring must be a shuffle-free projection, and the hashed
  * feature space must be bounded. */
class QualityClassifierSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies → linearly separable in hashed space
  // (collisions across 8 tokens in dim 512 are possible but cannot make
  // the classes inseparable unless a good token collides with a bad one;
  // fixed vocab + fixed hash makes this deterministic — it either always
  // works or never does, and it works)
  private def corpus = (1L to 200L).map { i =>
    if (i % 2 == 0) (i, "alpha beta gamma delta", 1)
    else (i, "zork grum blart feeb", 0)
  }.toDF("doc_id", "text", "is_good")

  test("train learns separable corpora; score is calibrated to the classes") {
    val feats = QualityClassifier.hashFeatures(corpus, col("is_good") === 1, dim = 512)
      .persist()
    val model = QualityClassifier.train(feats, dim = 512, epochs = 30, learningRate = 1.0)
    feats.unpersist()
    assert(model.weights.length === 512)

    val scored = QualityClassifier.score(corpus, model)
      .select(col("doc_id"), col("is_good"), col("quality_score")).collect()
    val correct = scored.count { r =>
      (r.getDouble(2) >= 0.5) == (r.getInt(1) == 1)
    }
    assert(correct >= 190, s"training accuracy ${correct / 200.0}") // ≥95%
    // calibration direction: mean good score above mean bad score
    val (good, bad) = scored.partition(_.getInt(1) == 1)
    assert(good.map(_.getDouble(2)).sum / good.length >
           bad.map(_.getDouble(2)).sum / bad.length + 0.5)
  }

  test("score is a shuffle-free projection") {
    val model = QualityClassifier.Model(new Array[Double](64), Array(0.0), Array(0.0), 0.0)
    val plan = QualityClassifier.score(corpus, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("exact-replay variant: learns, deterministic weights, shuffle-free score") {
    val feats = QualityClassifier
      .hashFeaturesExact(corpus, col("is_good") === 1, dim = 512).persist()
    val model = QualityClassifier.trainExactReplay(feats, dim = 512,
      epochs = 30, learningRate = 1.0)
    // integer-quantized GD is a PURE function of the corpus: a second
    // training run reproduces every weight unit exactly (the property the
    // DuckDB oracle's replay rests on)
    val model2 = QualityClassifier.trainExactReplay(feats, dim = 512,
      epochs = 30, learningRate = 1.0)
    feats.unpersist()
    assert(model.wq.toSeq === model2.wq.toSeq)
    assert(model.dwq.toSeq === model2.dwq.toSeq)
    assert(model.biasq === model2.biasq)

    val scored = QualityClassifier.scoreExact(corpus, model)
      .select(col("doc_id"), col("is_good"), col("quality_score")).collect()
    val correct = scored.count { r =>
      (r.getDouble(2) >= 0.5) == (r.getInt(1) == 1)
    }
    assert(correct >= 190, s"exact-variant training accuracy ${correct / 200.0}")

    val plan = QualityClassifier.scoreExact(corpus, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("exact-replay driver finisher equals the distributed epoch loop bit-for-bit") {
    // round-19.2: under graft.classifier.maxDriverRows the epoch loop
    // collects the sample and finishes on the driver — integer gradient
    // sums are order-independent, so the ExactModel must be IDENTICAL to
    // the distributed loop's, weight unit for weight unit. Corpus mixes
    // lengths, an empty-token doc, and a second dense dim; a sub-1.0
    // sampleFraction exercises the hash-sample path on both sides.
    val docs = (1L to 300L).map { i =>
      val txt =
        if (i % 37 == 0) ""
        else if (i % 2 == 0) ("alpha beta gamma delta " * ((i % 5) + 1).toInt).trim
        else ("zork grum blart feeb " * ((i % 3) + 1).toInt).trim
      (i, txt, if (i % 2 == 0) 1 else 0)
    }.toDF("doc_id", "text", "is_good")
    val denseExtra = Seq(length(col("text")).cast("double") / 7.0)
    val feats = QualityClassifier.hashFeaturesExact(docs, col("is_good") === 1,
      dim = 256, denseExprs = denseExtra).persist()
    try {
      spark.conf.set("graft.classifier.maxDriverRows", "0") // force distributed
      val dist = QualityClassifier.trainExactReplay(feats, dim = 256,
        denseDims = 2, epochs = 7, learningRate = 0.7, sampleFraction = 0.6)
      spark.conf.set("graft.classifier.maxDriverRows", "262144") // driver path
      val drv = QualityClassifier.trainExactReplay(feats, dim = 256,
        denseDims = 2, epochs = 7, learningRate = 0.7, sampleFraction = 0.6)
      assert(drv.wq.toSeq === dist.wq.toSeq)
      assert(drv.dwq.toSeq === dist.dwq.toSeq)
      assert(drv.mq.toSeq === dist.mq.toSeq)
      assert(drv.biasq === dist.biasq)
    } finally {
      spark.conf.unset("graft.classifier.maxDriverRows")
      feats.unpersist()
    }
  }

  test("dense channel learns a length gate the sparse buckets cannot") {
    // identical vocabulary everywhere, label = long doc: only the dense
    // ln(1+n_tokens) feature separates
    val lenCorpus = (1L to 200L).map { i =>
      val words = if (i % 2 == 0) 40 else 10
      (i, Seq.fill(words)("tok").mkString(" "), if (i % 2 == 0) 1 else 0)
    }.toDF("doc_id", "text", "is_good")
    val feats = QualityClassifier
      .hashFeatures(lenCorpus, col("is_good") === 1, dim = 128).persist()
    val model = QualityClassifier.train(feats, dim = 128, epochs = 30,
      learningRate = 1.0)
    feats.unpersist()
    val scored = QualityClassifier.score(lenCorpus, model).collect()
    val correct = scored.count { r =>
      (r.getAs[Double]("quality_score") >= 0.5) == (r.getInt(2) == 1)
    }
    assert(correct >= 190, s"length-gate accuracy ${correct / 200.0}")
  }

  test("25% hash-sample training lands within one AUC point of full-batch") {
    // separable core + deterministic label noise on every 7th doc, so the
    // ranking task is non-trivial and AUC < 1 for both models
    val noisy = (1L to 300L).map { i =>
      val good = i % 2 == 0
      val base = if (good) "alpha beta gamma delta" else "zork grum blart feeb"
      val noise = if (i % 7 == 0) (if (good) " zork grum" else " alpha beta") else ""
      (i, base + noise, if (good) 1 else 0)
    }.toDF("doc_id", "text", "is_good")
    val feats = QualityClassifier
      .hashFeatures(noisy, col("is_good") === 1, dim = 512).persist()
    val full = QualityClassifier.train(feats, dim = 512, epochs = 30,
      learningRate = 1.0)
    val smp = QualityClassifier.train(feats, dim = 512, epochs = 30,
      learningRate = 1.0, sampleFraction = 0.25)
    feats.unpersist()
    def auc(m: QualityClassifier.Model): Double =
      Evaluation.binaryMetrics(
          QualityClassifier.score(noisy, m),
          col("quality_score"), col("is_good") === 1, threshold = 0.5)
        .head().getAs[Double]("auc")
    val (fullAuc, sampleAuc) = (auc(full), auc(smp))
    assert(sampleAuc >= 0.95, s"sample-trained AUC $sampleAuc")
    assert(math.abs(fullAuc - sampleAuc) <= 0.01,
      s"full=$fullAuc sample=$sampleAuc diverge beyond one point")
  }

  test("hashFeatures bounds indices to dim and keeps duplicates") {
    val one = Seq((1L, "x y x", 1)).toDF("doc_id", "text", "is_good")
    val row = QualityClassifier.hashFeatures(one, col("is_good") === 1, dim = 7)
      .head()
    val feats = row.getSeq[Int](1)
    assert(feats.length === 3) // duplicate token kept
    assert(feats.forall(f => f >= 0 && f < 7))
    assert(feats(0) === feats(2)) // same token, same bucket
    assert(row.getDouble(2) === 1.0)
  }
}
