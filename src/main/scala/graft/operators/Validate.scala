package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level validation with a dead-letter channel — the reference's
  * signature operator (`validate_dataframe`, reference etl/validate.py:51-67:
  * per-row Pydantic validation producing `validated_records` +
  * `rejected_records(record_data, error_details)`).
  *
  * The reference loops row-by-row in Python; here the same semantics are
  * set-oriented: every rule is a vectorized `Column` predicate, all rules are
  * evaluated in one pass producing an `error_details` string, and the two
  * outputs are a filter / anti-filter over the tagged frame. Everything stays
  * inside whole-stage codegen — no UDFs, no per-row interpretation — so the
  * validator runs at scan speed at 100 TB and both branches reuse one scan
  * (Spark caches the tagged plan subtree when both sides are consumed).
  */
object Validate {

  /** A named validation rule: `ok` must evaluate true for the row to pass.
    * A NULL result (three-valued logic, e.g. `col >= 0` on a NULL) counts as
    * a failure, matching the reference where a missing/uncoercible field is
    * always an error. */
  final case class Rule(message: String, ok: Column)

  /** Append `error_details` (empty string = valid). concat_ws skips NULLs, so
    * only failed rules contribute; identical semantics exist in ANSI SQL for
    * the oracle. */
  def tag(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val errs = rules.map(r => when(!coalesce(r.ok, lit(false)), lit(r.message)))
    df.withColumn("error_details", concat_ws("; ", errs: _*))
  }

  /** Two-output split: (valid rows without the error column, rejected rows
    * with `error_details`). Reference keeps rejected rows with the stringified
    * payload (etl/load.py:55-71); callers can add `to_json(struct("*"))`. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = tag(df, rules)
    (tagged.filter(col("error_details") === "").drop("error_details"),
      tagged.filter(col("error_details") =!= ""))
  }

  /** Standard required-field rule (reference etl/validate.py: required model
    * fields; missing → validation error). */
  def required(cols: String*): Seq[Rule] =
    cols.map(c => Rule(s"$c is required", col(c).isNotNull))
}
