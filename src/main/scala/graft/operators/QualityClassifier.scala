package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, tokensFast}

/** Hashed-feature logistic regression trained inside the engine —
  * fasttext-style quality/domain classification, the standard curation
  * move when heuristic gates (TextAnalysis) run out: train on cheap weak
  * labels (a known-good corpus vs a known-bad one), score everything.
  *
  * The model is sparse + dense, like production quality classifiers:
  * hashed bag-of-tokens weights (which tokens) plus a dense channel
  * (by default `ln(1 + n_tokens)` — a length prior; callers add more via
  * `denseExprs`) plus an intercept. The dense channel matters: a signal
  * like document length is spread thin across every hashed bucket (sum
  * pooling ≈ count × mean weight) and full-batch GD takes forever to
  * assemble it from 4096 directions, but learns it in a few epochs as one
  * dense weight. The intercept matters too: with purely additive token
  * evidence every margin has the same sign and no origin-crossing
  * boundary exists.
  *
  * Spark-first shapes, no MLlib dependency:
  *
  *  - Features: one projection → `(id, features array<int>,
  *    dense array<double>, label)`; bounded width regardless of
  *    vocabulary, no shuffle.
  *  - Training: full-batch gradient descent, ONE distributed pass per
  *    epoch: residuals `sigma(margin) − y` per doc (codegen'd `aggregate`
  *    fold against the broadcast weights), then one exploded
  *    `(index, value)` aggregation carrying sparse counts, dense values
  *    and the bias row together — map-side combined, `dim`-bounded
  *    output, one `dim`-sized collect to the driver per epoch. Weights
  *    stay driver-side; data never moves.
  *  - Scoring: pure projection against the broadcast model — NO shuffle;
  *    scoring 100 TB is one codegen'd scan.
  *
  * Gradient sums are floating-point and partition-order dependent, so
  * trained weights are deterministic only up to float reordering — no SQL
  * oracle can exist; QualityClassifierSpec pins learnability (separable
  * corpora ≥95% training accuracy) and the shuffle-free score plan, and
  * the declared query (q89) gates on weak-label agreement at run time.
  */
object QualityClassifier {

  /** Trained model: sparse hashed-token weights, dense-channel weights +
    * the per-dim dense means they were centered on (all-positive dense
    * features with small contrast make plain GD zigzag in the
    * (weight, bias) plane; centering removes the coupling), intercept. */
  final case class Model(weights: Array[Double], dense: Array[Double],
                         denseMean: Array[Double], bias: Double)

  private def sparseFeats(textCol: Column, dim: Int): Column =
    transform(
      filter(tokensFast(textCol), t => t =!= ""),
      t => pmod(xxhash64(t), lit(dim.toLong)).cast("int"))

  private def denseFeats(featCol: Column, extra: Seq[Column]): Column =
    array((log(lit(1.0) + size(featCol)) +: extra.map(_.cast("double"))): _*)

  /** `(idCol, features array<int>, dense array<double>, label)` from raw
    * text + a boolean/0-1 label expression. One projection, no shuffle;
    * duplicate hashed indices are kept (a token occurring twice
    * contributes twice — the hashed analogue of term frequency). */
  def hashFeatures(docs: DataFrame, labelExpr: Column, dim: Int = 4096,
                   denseExprs: Seq[Column] = Nil,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dim > 0, "dim must be positive")
    graft.plans.Tokenize.register(docs.sparkSession)
    // extra dense expressions are evaluated against the caller's frame
    // (they may reference any of its columns), features against the text
    val extras = denseExprs.zipWithIndex
      .map { case (e, i) => e.cast("double").as(s"__graft_x$i") }
    docs
      .select(col(idCol) +: sparseFeats(col(textCol), dim).as("features") +:
        labelExpr.cast("double").as("label") +: extras: _*)
      .withColumn("dense", denseFeats(col("features"),
        denseExprs.indices.map(i => col(s"__graft_x$i"))))
      .drop(denseExprs.indices.map(i => s"__graft_x$i"): _*)
  }

  /** Margin of one row against broadcast weights: MEAN-pooled sparse fold
    * (fasttext-style — bounded regardless of document length, which is
    * what keeps full-batch steps stable; length itself belongs to the
    * dense channel) + dense dot + bias (weights ride into the plan as
    * literals). */
  private def margin(featCol: Column, denseCol: Column, m: Model): Column = {
    val sparse = aggregate(featCol, lit(0.0).cast("double"),
      (acc, f) => acc + element_at(lit(m.weights), f + 1)) /
      greatest(size(featCol), lit(1)).cast("double")
    val dense = m.dense.zipWithIndex
      .map { case (w, i) =>
        lit(w) * (element_at(denseCol, i + 1) - lit(m.denseMean(i))) }
      .foldLeft(lit(0.0).cast("double"))(_ + _)
    sparse + dense + lit(m.bias)
  }

  private def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))

  /** Full-batch GD on the logistic loss. `denseDims` must match the arity
    * `hashFeatures` produced (1 + its `denseExprs` size). Cache `features`
    * — training runs `epochs` passes over it.
    *
    * `sampleFraction < 1` trains on a deterministic [[Sampling.hashSample]]
    * of the frame (keyed on `sampleIdCol`, drawn ONCE and cached for the
    * epoch loop) — the standard move at corpus scale, where an epoch is a
    * full corpus pass and 20 epochs × 100 TB is 20 reads for a model whose
    * gradient saturates on a fraction of the rows. The runtime quality
    * gate (q89's ≥85% agreement `require`, or the caller's own eval via
    * [[Evaluation.binaryMetrics]]) decides whether accuracy survived the
    * sample; QualityClassifierSpec pins a 25% sample within one AUC point
    * of full-batch on the test corpus. */
  def train(features: DataFrame, dim: Int = 4096, denseDims: Int = 1,
            epochs: Int = 20, learningRate: Double = 0.5,
            sampleFraction: Double = 1.0,
            sampleIdCol: String = "doc_id"): Model = {
    require(epochs > 0, "epochs must be positive")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      "sampleFraction must be in (0, 1]")
    val sampled = sampleFraction < 1.0
    val base =
      if (!sampled) features
      else Sampling.hashSample(features, col(sampleIdCol), sampleFraction,
        seed = "graft-train")
        // localCheckpoint, not persist (round-19): every epoch re-analyzes
        // the training frame's full logical plan (hash-sample over the
        // caller's feature projection over the scan) plus a fresh weights
        // literal — measured ~1.1 s of BETWEEN-job driver time on q89's six
        // epochs at sf0.1. Truncating to a leaf makes each epoch's analyzed
        // plan O(epoch body); blocks land in the same memory+disk store.
        .localCheckpoint(true)
    try {
    // ONE action for row count, dense-arity probe and the dense means
    // (round-19: was three passes — see trainExactReplay)
    val probeCols = Seq(count(lit(1)).as("n"),
      min(size(col("dense"))).as("mn"),
      max(size(col("dense"))).as("mx")) ++
      (0 until denseDims).map(k =>
        avg(element_at(col("dense"), k + 1)).as(s"m$k"))
    val probe = base.agg(probeCols.head, probeCols.tail: _*).head()
    val n = probe.getLong(0).toDouble
    require(n > 0, "cannot train on an empty frame (sample too small?)")
    require(probe.getInt(1) == denseDims && probe.getInt(2) == denseDims,
      s"denseDims=$denseDims does not match the dense array length " +
        s"${probe.getInt(2)} produced at hashFeatures time — pass the " +
        "arity the feature frame was built with (1 + denseExprs.size)")
    val denseMean = Array.tabulate(denseDims)(k => probe.getDouble(3 + k))
    var m = Model(new Array[Double](dim), new Array[Double](denseDims),
      denseMean, 0.0)
    // gradient indices: 0..dim-1 sparse (each instance weighted 1/len to
    // match the mean-pooled margin), -1 bias, -(k+2) dense dim k
    val invLen = lit(1.0) / greatest(size(col("features")), lit(1)).cast("double")
    val gradIndex = concat(
      transform(col("features"), f => struct(f.as("i"), invLen.as("v"))),
      array(struct(lit(-1).as("i"), lit(1.0).as("v"))),
      transform(sequence(lit(0), lit(denseDims - 1)),
        k => struct((-k - 2).as("i"),
          (element_at(col("dense"), k + 1) -
            element_at(lit(denseMean), k + 1)).as("v"))))
    for (_ <- 1 to epochs) {
      val grad = base
        .select(gradIndex.as("__gi"),
          (sigmoid(margin(col("features"), col("dense"), m)) - col("label"))
            .as("__resid"))
        .select(explode(col("__gi")).as("__e"), col("__resid"))
        .groupBy(col("__e.i").as("__i"))
        .agg(sum(col("__resid") * col("__e.v")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      def step(old: Double, idx: Int) =
        old - learningRate * grad.getOrElse(idx, 0.0) / n
      m = Model(
        Array.tabulate(dim)(i => step(m.weights(i), i)),
        Array.tabulate(denseDims)(k => step(m.dense(k), -k - 2)),
        denseMean,
        step(m.bias, -1))
    }
    m
    } finally { if (sampled) base.unpersist() }
  }

  /** Score `docs`: adds `quality_score` = P(label=1 | text). Pure
    * projection — shuffle-free at any scale. Feature arrays are projected
    * into their own columns BEFORE the fold consumes them (Spark does not
    * CSE inside higher-order-function lambdas; folding directly over the
    * transform expression re-tokenizes per element). `denseExprs` must be
    * the same expressions used at `hashFeatures` time. */
  def score(docs: DataFrame, model: Model, denseExprs: Seq[Column] = Nil,
            textCol: String = "text"): DataFrame =
    docs
      .withColumn("__graft_feats", sparseFeats(col(textCol), model.weights.length))
      .withColumn("__graft_dense", denseFeats(col("__graft_feats"), denseExprs))
      .withColumn("quality_score",
        round(sigmoid(margin(col("__graft_feats"), col("__graft_dense"), model)), 4))
      .drop("__graft_feats", "__graft_dense")

  // ------------------------------------------------- exact-replay variant

  /** EXACT-REPLAY classifier (round-18 — the portable-sketch pattern
    * applied to trained-model state, the q118/q36 move for GD):
    * [[train]]'s float gradient sums are partition-order dependent, but
    * the three non-portable ingredients each have a portable substitute
    * with the same modeling power:
    *
    *  - `xxhash64` feature hashing → the portable 60-bit md5 hash
    *    ([[graft.plans.Hash60]], SQL twin proven since round 14);
    *  - the `ln(1+n)` length prior → `sqrt(n)` — IEEE-754 REQUIRES sqrt
    *    to be correctly rounded, so it is bit-identical across engines,
    *    while `log`/`exp` are library functions with no cross-engine
    *    bit contract (the actual boundary that kept q89 rows-only);
    *  - the logistic sigmoid → the rational squashing function
    *    σ̂(x) = 0.5 + x / (2·(1+|x|)) — only +,×,/,abs, all exact IEEE;
    *    same sign structure, same 0.5-at-margin-0 threshold, and its
    *    implied loss is a valid classification objective (gradient
    *    direction preserved), so the accuracy gate is unchanged;
    *
    * plus the integer carry: WEIGHTS are BIGINT units of 1e−12, per-row
    * gradient contributions are quantized to BIGINT units of 1e−9 BEFORE
    * the cross-partition sum (exact, order-independent), dense features
    * quantize to 1e−6 units and center on a floorDiv mean. Every epoch is
    * then either exact integer math or a fixed-order deterministic IEEE
    * expression — a second engine replays all epochs and the final scores
    * cell-exactly. Quantization costs ≤1e−9 per gradient element per
    * epoch — invisible to a classifier gated on accuracy. */
  final case class ExactModel(wq: Array[Long], dwq: Array[Long],
                              mq: Array[Long], biasq: Long)

  private val WScaleD = 1e12 // weight units
  private val GScaleD = 1e9  // gradient-contribution units
  private val DQScaleD = 1e6 // dense-feature units

  private def sparseFeatsExact(textCol: Column, dim: Int): Column =
    transform(
      filter(tokensFast(textCol), t => t =!= ""),
      t => pmod(graft.functions.TextFunctions.hash60Fast(t),
        lit(dim.toLong)).cast("int"))

  private def denseFeatsExact(featCol: Column, extra: Seq[Column]): Column =
    array((sqrt(size(featCol).cast("double")) +:
      extra.map(_.cast("double"))): _*)

  /** Portable-hash twin of [[hashFeatures]]: md5-derived feature ids,
    * sqrt length prior. Registers the Hash60/Tokenize kernels. */
  def hashFeaturesExact(docs: DataFrame, labelExpr: Column, dim: Int = 4096,
                        denseExprs: Seq[Column] = Nil,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(dim > 0, "dim must be positive")
    graft.plans.Tokenize.register(docs.sparkSession)
    graft.plans.Hash60.register(docs.sparkSession)
    val extras = denseExprs.zipWithIndex
      .map { case (e, i) => e.cast("double").as(s"__graft_x$i") }
    docs
      .select(col(idCol) +: sparseFeatsExact(col(textCol), dim).as("features") +:
        labelExpr.cast("double").as("label") +: extras: _*)
      .withColumn("dense", denseFeatsExact(col("features"),
        denseExprs.indices.map(i => col(s"__graft_x$i"))))
      .drop(denseExprs.indices.map(i => s"__graft_x$i"): _*)
  }

  /** Rational squashing function — exact IEEE, cross-engine. */
  private def sigmaHat(c: Column): Column =
    lit(0.5) + c / (lit(2.0) * (lit(1.0) + abs(c)))

  /** Margin against integer weights: exact BIGINT token-weight sum
    * (fold order irrelevant for integers), then a FIXED left-to-right
    * chain of deterministic IEEE terms — the same expression the oracle
    * spells. */
  private def marginExact(featCol: Column, denseCol: Column,
                          m: ExactModel): Column = {
    val lenD = greatest(size(featCol), lit(1)).cast("double")
    val sumWq = aggregate(featCol, lit(0L),
      (acc, f) => acc + element_at(lit(m.wq), f + 1))
    val sparse = (sumWq.cast("double") / lit(WScaleD)) / lenD
    val withDense = m.dwq.zipWithIndex.foldLeft(sparse) { case (acc, (w, k)) =>
      val dq = floor(element_at(denseCol, k + 1) * lit(DQScaleD)).cast("long")
      acc + lit(w.toDouble / WScaleD) *
        ((dq - lit(m.mq(k))).cast("double") / lit(DQScaleD))
    }
    withDense + lit(m.biasq.toDouble / WScaleD)
  }

  /** Session-conf cap for the trainExactReplay driver finisher: the
    * training sample collects to the driver when it has at most this many
    * rows (default 256k — at the corpus's ~50-300 tokens/doc that is a
    * ~64-300 MB collect, the same bounded-collect class as
    * `graft.graph.maxDriverEdges`). 0 disables the finisher. */
  private def maxDriverRows(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("graft.classifier.maxDriverRows")
      .map(_.toLong).getOrElse(262144L)

  /** Full-batch GD with exact integer carry — same shuffle shape as
    * [[train]] (one codegen residual pass + one map-side-combined index
    * aggregation + one dim-bounded collect per epoch), but every
    * cross-partition sum is BIGINT.
    *
    * Driver finisher (round-19.2, the q78/q92/q110 pattern applied to the
    * epoch loop): every cross-row reduction in this trainer is either a
    * BIGINT sum of per-row quantized contributions (order-independent by
    * construction — that is what makes the oracle replay possible) or a
    * fixed per-row IEEE expression, so when the materialized training
    * sample fits under `graft.classifier.maxDriverRows` one collect plus
    * a driver loop over the SAME rows yields the bit-identical ExactModel
    * while paying the job-scheduling floor once instead of 2×epochs+1
    * times (the probe and each epoch's map+reduce jobs; measured ~0.8 s
    * of between-job driver time on q89's six epochs at sf0.1). Above the
    * cap — or when any row carries a NULL feature/dense/label, whose
    * propagation the distributed expressions define — the distributed
    * loop below runs unchanged. Equality is pinned by
    * QualityClassifierSpec (cap forced to 0 vs default). */
  def trainExactReplay(features: DataFrame, dim: Int = 4096,
                       denseDims: Int = 1, epochs: Int = 20,
                       learningRate: Double = 0.5,
                       sampleFraction: Double = 1.0,
                       sampleIdCol: String = "doc_id"): ExactModel = {
    require(epochs > 0, "epochs must be positive")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      "sampleFraction must be in (0, 1]")
    val sampled = sampleFraction < 1.0
    val sampledDf =
      if (!sampled) features
      else Sampling.hashSample(features, col(sampleIdCol), sampleFraction,
        seed = "graft-train")
    val cap = maxDriverRows(features.sparkSession)
    // gate + fetch in ONE action (the take(cap+1) idiom): an over-cap
    // sample is detected by length and falls through to the distributed
    // loop. The driver path never localCheckpoints — the collect IS the
    // materialization.
    val fetched =
      if (cap > 0 && cap < Int.MaxValue.toLong)
        sampledDf.select(col("features"), col("dense"), col("label"))
          .limit(cap.toInt + 1).collect()
      else null
    if (fetched != null && fetched.length <= cap && fetched.forall(cleanRow))
      return trainExactDriver(fetched, dim, denseDims, epochs, learningRate)
    val base =
      if (!sampled) features
      else sampledDf
        // localCheckpoint, not persist (round-19): every epoch re-analyzes
        // the training frame's full logical plan (hash-sample over the
        // caller's feature projection over the scan) plus a fresh weights
        // literal — measured ~1.1 s of BETWEEN-job driver time on q89's six
        // epochs at sf0.1. Truncating to a leaf makes each epoch's analyzed
        // plan O(epoch body); blocks land in the same memory+disk store.
        .localCheckpoint(true)
    try {
    // ONE action for row count, dense-arity probe and the quantized dense
    // sums (round-19: these were three driver actions — count, a head()
    // probe, a sums head() — each a full pass over the sampled frame
    // before the first epoch; the arity check is now over EVERY row via
    // min/max, strictly stronger than the old first-row probe)
    val dqCols = (0 until denseDims).map(k =>
      floor(element_at(col("dense"), k + 1) * lit(DQScaleD)).cast("long"))
    val probeCols = Seq(count(lit(1)).as("n"),
      min(size(col("dense"))).as("mn"),
      max(size(col("dense"))).as("mx")) ++
      dqCols.zipWithIndex.map { case (c, k) => sum(c).as(s"s$k") }
    val probe = base.agg(probeCols.head, probeCols.tail: _*).head()
    val nL = probe.getLong(0)
    require(nL > 0, "cannot train on an empty frame (sample too small?)")
    require(probe.getInt(1) == denseDims && probe.getInt(2) == denseDims,
      s"denseDims=$denseDims does not match the dense array length " +
        s"${probe.getInt(2)} produced at hashFeatures time — pass the " +
        "arity the feature frame was built with (1 + denseExprs.size)")
    val n = nL.toDouble
    // dense means as floorDiv of exact quantized sums — order-independent
    val mq = Array.tabulate(denseDims)(k => Math.floorDiv(probe.getLong(3 + k), nL))
    var m = ExactModel(new Array[Long](dim), new Array[Long](denseDims),
      mq, 0L)
    val invLen = lit(1.0) / greatest(size(col("features")), lit(1)).cast("double")
    val gradIndex = concat(
      transform(col("features"), f => struct(f.as("i"), invLen.as("v"))),
      array(struct(lit(-1).as("i"), lit(1.0).as("v"))),
      transform(sequence(lit(0), lit(denseDims - 1)),
        k => struct((-k - 2).as("i"),
          ((floor(element_at(col("dense"), k + 1) * lit(DQScaleD)).cast("long") -
            element_at(lit(mq), k + 1)).cast("double") / lit(DQScaleD)).as("v"))))
    for (_ <- 1 to epochs) {
      val grad = base
        .select(gradIndex.as("__gi"),
          (sigmaHat(marginExact(col("features"), col("dense"), m)) - col("label"))
            .as("__resid"))
        .select(explode(col("__gi")).as("__e"), col("__resid"))
        .groupBy(col("__e.i").as("__i"))
        .agg(sum(floor((col("__resid") * col("__e.v")) * lit(GScaleD))
          .cast("long")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      def stepQ(oldQ: Long, idx: Int): Long = {
        val sx = grad.getOrElse(idx, 0L)
        oldQ - math.floor(
          ((learningRate * (sx.toDouble / GScaleD)) / n) * WScaleD).toLong
      }
      m = ExactModel(
        Array.tabulate(dim)(i => stepQ(m.wq(i), i)),
        Array.tabulate(denseDims)(k => stepQ(m.dwq(k), -k - 2)),
        mq,
        stepQ(m.biasq, -1))
    }
    m
    } finally { if (sampled) base.unpersist() }
  }

  /** A collected training row is driver-loop eligible only when nothing
    * is NULL (top-level or inside the arrays): NULL propagation through
    * the distributed expressions (size(NULL), NULL margins dropped by
    * sum) is semantics the driver loop does not replicate, so such rows
    * route to the distributed path unchanged. */
  private def cleanRow(r: org.apache.spark.sql.Row): Boolean =
    !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) &&
      !r.getSeq[Any](0).exists(_ == null) &&
      !r.getSeq[Any](1).exists(_ == null)

  /** The epoch loop over the collected sample — every term mirrors the
    * distributed expressions one for one ([[marginExact]] / `gradIndex` /
    * the probe aggregation in [[trainExactReplay]]): per-row margins and
    * residuals are the same fixed IEEE chains, per-occurrence gradient
    * contributions quantize with the same `floor(x·1e9)` BEFORE any
    * cross-row addition, and the cross-row reductions are BIGINT adds —
    * order-independent, so accumulating row-by-row here equals the
    * map-side-combined aggregation bit for bit. */
  private def trainExactDriver(rows: Array[org.apache.spark.sql.Row],
                               dim: Int, denseDims: Int, epochs: Int,
                               learningRate: Double): ExactModel = {
    val n = rows.length
    require(n > 0, "cannot train on an empty frame (sample too small?)")
    val feats = new Array[Array[Int]](n)
    val dense = new Array[Array[Double]](n)
    val labels = new Array[Double](n)
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var i = 0
    while (i < n) {
      feats(i) = rows(i).getSeq[Int](0).toArray
      val d = rows(i).getSeq[Double](1).toArray
      dense(i) = d
      labels(i) = rows(i).getDouble(2)
      if (d.length < mn) mn = d.length
      if (d.length > mx) mx = d.length
      i += 1
    }
    require(mn == denseDims && mx == denseDims,
      s"denseDims=$denseDims does not match the dense array length " +
        s"$mx produced at hashFeatures time — pass the " +
        "arity the feature frame was built with (1 + denseExprs.size)")
    val nL = n.toLong
    val nD = n.toDouble
    // dense means as floorDiv of exact quantized sums — the probe twin
    val mq = Array.tabulate(denseDims) { k =>
      var s = 0L
      var r = 0
      while (r < n) { s += math.floor(dense(r)(k) * DQScaleD).toLong; r += 1 }
      Math.floorDiv(s, nL)
    }
    var wq = new Array[Long](dim)
    var dwq = new Array[Long](denseDims)
    var biasq = 0L
    for (_ <- 1 to epochs) {
      val gw = new Array[Long](dim)
      val gd = new Array[Long](denseDims)
      var gb = 0L
      var r = 0
      while (r < n) {
        val f = feats(r)
        val len = f.length
        val lenD = math.max(len, 1).toDouble
        var sumWq = 0L
        var j = 0
        while (j < len) { sumWq += wq(f(j)); j += 1 }
        // marginExact's exact term order: sparse, then each dense dim in
        // index order, then the bias
        var acc = (sumWq.toDouble / WScaleD) / lenD
        var k = 0
        while (k < denseDims) {
          val dq = math.floor(dense(r)(k) * DQScaleD).toLong
          acc += (dwq(k).toDouble / WScaleD) *
            ((dq - mq(k)).toDouble / DQScaleD)
          k += 1
        }
        val margin = acc + biasq.toDouble / WScaleD
        val sh = 0.5 + margin / (2.0 * (1.0 + math.abs(margin)))
        val resid = sh - labels(r)
        val invLen = 1.0 / lenD
        j = 0
        while (j < len) {
          gw(f(j)) += math.floor((resid * invLen) * GScaleD).toLong
          j += 1
        }
        gb += math.floor((resid * 1.0) * GScaleD).toLong
        k = 0
        while (k < denseDims) {
          val dq = math.floor(dense(r)(k) * DQScaleD).toLong
          val v = (dq - mq(k)).toDouble / DQScaleD
          gd(k) += math.floor((resid * v) * GScaleD).toLong
          k += 1
        }
        r += 1
      }
      def stepQ(oldQ: Long, sx: Long): Long =
        oldQ - math.floor(
          ((learningRate * (sx.toDouble / GScaleD)) / nD) * WScaleD).toLong
      wq = Array.tabulate(dim)(i => stepQ(wq(i), gw(i)))
      dwq = Array.tabulate(denseDims)(k => stepQ(dwq(k), gd(k)))
      biasq = stepQ(biasq, gb)
    }
    ExactModel(wq, dwq, mq, biasq)
  }

  /** Exact-replay scoring: shuffle-free projection, quality_score =
    * round(σ̂(margin), 4) — identical arithmetic to the oracle's replay. */
  def scoreExact(docs: DataFrame, model: ExactModel,
                 denseExprs: Seq[Column] = Nil,
                 textCol: String = "text"): DataFrame = {
    graft.plans.Tokenize.register(docs.sparkSession)
    graft.plans.Hash60.register(docs.sparkSession)
    docs
      .withColumn("__graft_feats", sparseFeatsExact(col(textCol), model.wq.length))
      .withColumn("__graft_dense", denseFeatsExact(col("__graft_feats"), denseExprs))
      .withColumn("quality_score",
        round(sigmaHat(marginExact(col("__graft_feats"), col("__graft_dense"),
          model)), 4))
      .drop("__graft_feats", "__graft_dense")
  }
}
