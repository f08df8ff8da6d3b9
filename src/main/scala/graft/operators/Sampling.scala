package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * Training-corpus curation needs samples that are (a) reproducible across
  * runs and engines — a re-run of the pipeline must pick the SAME rows, so
  * no `rand()` — and (b) controllable per stratum (language, source,
  * domain) to hit a target mixture. Determinism comes from ordering/
  * thresholding on `md5(seed | id)`: stable across Spark, DuckDB, and any
  * engine with md5, which also makes every operator here oracle-checkable.
  *
  * Two shapes, two scale profiles:
  *
  *  - [[hashSample]] / [[weightedMix]]: Bernoulli by hash threshold —
  *    a pure filter, NO shuffle, constant memory; keeps each row iff
  *    `hash(seed|id) mod D < fraction·D`. Sample size is fraction·n in
  *    expectation only. This is the 100 TB default: sampling 100 TB is one
  *    codegen'd scan.
  *  - [[stratifiedQuota]]: exact top-`quota` rows per stratum in hash
  *    order — one shuffle (window partitioned by stratum) and a per-stratum
  *    sort. Exact sizes; use when quotas are hard requirements. Skewed
  *    strata sort within their partition; for a stratum too large to sort,
  *    pre-thin with [[hashSample]] to ~2× the quota first (composition
  *    stays deterministic).
  */
object Sampling {

  private val D = 1000000L // hash-threshold denominator: ppm resolution

  /** Uniform [0, 1) deterministic hash of `id` under `seed` — the first 8
    * md5 hex chars as an integer, scaled. Engine-portable.
    *
    * Precision note: 2^32 is not a multiple of D = 1e6, so the modulo is
    * very slightly biased — residues below 2^32 mod 1e6 = 967296 occur
    * floor(2^32/1e6)+1 = 4296 times among the 2^32 hash values vs 4295 for
    * the rest, a ~0.023% per-residue (≲0.5% cumulative near small
    * thresholds) tilt toward LOW residues. Selected fractions therefore run
    * a hair high. Negligible for corpus mixing and mirrored exactly by the
    * oracle (same formula both engines), but do not use this for tight
    * statistical work — draw from a wider hash if unbiased sampling
    * matters. */
  def hashUnit(seed: String, id: Column): Column =
    (conv(substring(md5(concat(lit(seed + "|"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % D).cast("double") / D

  /** Keep each row with probability `fraction`, deterministically in `id`:
    * a shuffle-free filter. */
  def hashSample(df: DataFrame, id: Column, fraction: Double,
                 seed: String = "graft"): DataFrame =
    df.filter(hashUnit(seed, id) < fraction)

  /** Per-stratum Bernoulli fractions (a domain-mixture downsample):
    * still a pure filter — the fraction is looked up per row from the
    * when-chain, the hash decides. Strata absent from `fractions` keep
    * `default`. */
  def weightedMix(df: DataFrame, stratum: Column, id: Column,
                  fractions: Map[String, Double], default: Double = 0.0,
                  seed: String = "graft"): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (rest, (k, f)) =>
      when(stratum === k, lit(f)).otherwise(rest)
    }
    df.filter(hashUnit(seed, id) < frac)
  }

  /** Temperature-flattened domain mixture — the standard LLM-corpus
    * reweighting where the target share of stratum i is ∝ n_i^alpha
    * (alpha < 1 upweights rare domains relative to their natural share;
    * alpha = 1 is a no-op). Realized as per-stratum Bernoulli rates
    * `r_i = (n_min / n_i)^(1-alpha)`: the smallest stratum keeps every
    * row, larger strata downsample, and expected kept counts are
    * `n_min^(1-alpha) · n_i^alpha` — exactly the flattened mix.
    *
    * Scale shape: one stratum-count aggregate (map-side combined, output
    * is #strata rows) broadcast back onto the scan, then the same
    * shuffle-free hash filter as [[weightedMix]] — two scans total, no
    * shuffle of data rows. Unlike [[weightedMix]] the rates need no
    * hand-tuning; they derive from the observed counts. */
  def temperatureMix(df: DataFrame, stratum: Column, id: Column,
                     alpha: Double = 0.5, seed: String = "graft"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(stratum.as("__graft_stratum"))
      .agg(count(lit(1)).as("__graft_n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min("__graft_n").as("__graft_nmin"))))
      .select(col("__graft_stratum"),
        pow(col("__graft_nmin").cast("double") / col("__graft_n"), 1.0 - alpha)
          .as("__graft_rate"))
    // null-safe match: a null stratum is its own group in the count
    // aggregate, so it must find its own rate row too (=== would silently
    // drop every null-stratum row)
    df.join(broadcast(rates), stratum <=> col("__graft_stratum"))
      .filter(hashUnit(seed, id) < col("__graft_rate"))
      .drop("__graft_stratum", "__graft_rate")
  }

  /** Quality-weighted rejection sampling: keep each row with probability
    * equal to its own (precomputed, [0,1]) score — the soft quality
    * filter of the FineWeb/CCNet curation family, where a hard threshold
    * would cliff the distribution: a 0.9-score document survives 90% of
    * seeds, a 0.2 one 20%, and the kept corpus's score distribution is
    * the input's reweighted by score. Deterministic in (seed, id) like
    * every sampler here (re-runs keep the same rows), and still a pure
    * shuffle-free filter: the score column is computed by an upstream
    * projection, the hash decides. Scores outside [0,1] are clamped. */
  def scoreSample(df: DataFrame, score: Column, id: Column,
                  seed: String = "graft"): DataFrame =
    df.filter(hashUnit(seed, id) < least(greatest(score, lit(0.0)), lit(1.0)))

  /** Deterministic multi-way split assignment (train/validation/test):
    * adds a `split` column mapping each row to the band of `hashUnit(seed,
    * id)` its hash falls in — `splits` are (name, fraction) pairs whose
    * fractions must sum to 1 (within 1e-9; the last band absorbs the
    * remainder so every row is assigned).
    *
    * The property that matters for training pipelines: the assignment is a
    * pure function of (seed, id) — no rand(), no row order, no partition
    * count — so splits are disjoint, exhaustive, stable across engines/
    * re-runs/repartitioning, and a given document can never migrate from
    * test into train when the corpus is re-processed (the leakage failure
    * mode this exists to prevent). A shuffle-free projection: at 100 TB
    * the split is one codegen'd scan, and each split's consumer filters on
    * its own band (`split = 'train'` pushes to the scan as a predicate on
    * the derived column's generator — or materialize once, partitioned BY
    * split, and every epoch reads its slice). */
  def assignSplits(df: DataFrame, id: Column, splits: Seq[(String, Double)],
                   seed: String = "graft"): DataFrame = {
    require(splits.size >= 2, "assignSplits needs at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val u = hashUnit(seed, id)
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail // cumulative uppers
    // last band is the otherwise-branch: exhaustive by construction, no
    // float-boundary row can fall through
    val expr = splits.init.zip(cuts.init).reverse
      .foldLeft(lit(splits.last._1)) { case (rest, ((name, _), upper)) =>
        when(u < upper, lit(name)).otherwise(rest)
      }
    df.withColumn("split", expr)
  }

  /** Exactly `quota` rows per stratum (fewer when the stratum is smaller),
    * chosen as the first `quota` in deterministic hash order. */
  def stratifiedQuota(df: DataFrame, stratum: Column, id: Column, quota: Int,
                      seed: String = "graft"): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(md5(concat(lit(seed + "|"), id.cast("string"))), id)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= quota)
      .drop("__graft_rn")
  }
}
