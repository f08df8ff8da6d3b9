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
