package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the dedup / analysis operators. All built-ins (split,
  * higher-order transforms, md5) — codegen-friendly, and every definition has
  * an exact ANSI-SQL twin for the DuckDB oracle.
  *
  * Hashing convention: the engine-portable hash family is
  * `md5(seed || "|" || value)` — md5 produces identical lowercase hex in
  * Spark and DuckDB, so MinHash/SimHash signatures reproduce bit-for-bit in
  * the oracle. (Inside Spark-only paths xxhash64 would be cheaper; md5 is the
  * price of cross-engine verifiability and is still fully codegen'd.)
  */
object TextFunctions {

  /** Whitespace tokens of the lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Kernel form of [[tokens]] ([[graft.plans.Tokenize]]): element-for-
    * element equal (differential-tested, including the leading/trailing ""
    * elements a tab-edged string produces and the `[""]` of an empty one),
    * with no regex engine and no decode round-trip — the expression form's
    * Java `Pattern` machine was the dominant slice of the documents-scan
    * floor. Callers register the kernel on the session first
    * (`graft.plans.Tokenize.register`); every operator entry point using
    * this does so. The SQL-oracle twin is unchanged:
    * `string_split_regex(lower(trim(text)), '\s+')`. */
  def tokensFast(text: Column): Column = call_function("graft_tokens", text)

  /** Distinct word n-gram shingles from an ALREADY-MATERIALIZED tokens
    * column (an attribute, not the split expression). Passing the raw
    * `tokens(text)` expression here would re-evaluate the split once per
    * `element_at` reference inside the lambda — measured 10× slowdown —
    * so callers must project tokens into a column first
    * (see [[withShingleRows]]). */
  def shinglesFromTokens(t: Column, n: Int = 3): Column = {
    val grams = when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (1 to n).map(k => element_at(t, i + k)): _*))
    ).otherwise(array().cast("array<string>"))
    array_distinct(grams)
  }

  /** Distinct word n-gram shingles of a text column (projects tokens into a
    * materialized column internally; fine for one-shot use). */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** POSITIONAL shingles (duplicates kept, document order preserved) — the
    * input a rolling/winnowing fingerprint needs. Same materialized-tokens
    * contract as [[shinglesFromTokens]]. */
  def positionalShinglesFromTokens(t: Column, n: Int = 3): Column =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (1 to n).map(k => element_at(t, i + k)): _*))
    ).otherwise(array().cast("array<string>"))

  /** Winnowing (MOSS-style) fingerprint selection over a positional hash
    * sequence: the minimum hash of every length-`w` window, deduplicated.
    * Guarantees any match of length ≥ w+n-1 tokens shares a fingerprint,
    * with ~2/(w+1) of hashes kept — the standard local sampling for
    * plagiarism/near-dup detection. `hashes` is an `array<bigint>` of
    * portable [[hash60]] values (round-15: fingerprints ride as 8-byte
    * longs, not hex strings — the min-selection, shuffle keys and
    * aggregation keys all work on fixed-width integers, and the oracle
    * mirrors the same 60-bit family so parity is exact by construction). */
  def winnow(hashes: Column, w: Int = 4): Column =
    when(size(hashes) >= w,
      array_distinct(transform(sequence(lit(0), size(hashes) - w), i =>
        array_min(slice(hashes, i + 1, lit(w))))))
      .otherwise(when(size(hashes) > 0, array(array_min(hashes)))
        .otherwise(array().cast("array<bigint>")))

  /** Seeded portable hash to hex (full md5). */
  def seededMd5(seed: Int, value: Column): Column =
    md5(concat(lit(s"$seed|"), value))

  /** Seeded portable hash to a 60-bit non-negative long (15 hex chars →
    * conv base 16). 60 bits keeps it inside BIGINT range in both engines. */
  def hash60(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** Kernel form of [[hash60]] ([[graft.plans.Hash60]]): bit-identical
    * value (differential-tested), ~6× cheaper — no hex-string round-trip.
    * Callers must register the kernel on the session first
    * (`graft.plans.Hash60.register`); every operator entry point using
    * this does so. The SQL-oracle twin is unchanged:
    * `('0x'||substr(md5(s),1,15))::BIGINT`. */
  def hash60Fast(value: Column): Column = call_function("graft_hash60", value)

  /** Fused positional-n-gram hash kernel ([[graft.plans.NgramHash60]]):
    * element-for-element equal to
    * `transform(positionalShinglesFromTokens(t, n), s => hash60(s))`
    * (differential-tested) with no intermediate gram strings. Callers
    * register the kernel on the session first. `t` must be a
    * MATERIALIZED tokens attribute (same contract as
    * [[positionalShinglesFromTokens]]). */
  def ngramHash60(t: Column, n: Int): Column =
    call_function("graft_ngram_hash60", t, lit(n))

  /** Count of non-overlapping occurrences of literal `marker` in `text`
    * via the replace-length trick (plain string replace, not regex) —
    * identical semantics in DuckDB. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(call_function("replace", text, lit(marker), lit(""))))
      / marker.length).cast("int")

  /** Whitespace-normalized md5 fingerprint (exact-dup canonicalizer). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))
}
