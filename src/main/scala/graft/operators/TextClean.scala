package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing / text cleaning for training corpora: redact emails,
  * URLs, and phone numbers behind typed placeholder tokens, reporting
  * per-document redaction counts.
  *
  * Pure per-row projection — codegen'd `regexp_replace`/`regexp_count`, no
  * shuffle, no UDF: scrubbing 100 TB is one scan. Patterns avoid
  * constructs where Java regex (Spark, backtracking leftmost-first) and
  * RE2 (DuckDB/oracle, leftmost-longest) could disagree: greedy character
  * classes and fixed-width digit groups only, no alternation whose branch
  * choice differs between the two engines.
  *
  * Counts are measured on the ORIGINAL text, independently per category,
  * so replacement order cannot change them; replacements then apply
  * URL → email → phone (URLs first so an address inside a query string is
  * swallowed by `<URL>` rather than half-redacted).
  */
object TextClean {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  /** +C[C] NNN-NNNN international-ish form; fixed-width groups for
    * engine-portable matching. */
  val PhoneRe = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"

  /** Adds `clean_text`, `n_emails`, `n_urls`, `n_phones`. */
  def scrubPii(df: DataFrame, text: Column): DataFrame = {
    val cleaned =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")
    df.withColumn("n_emails", regexp_count(text, lit(EmailRe)))
      .withColumn("n_urls", regexp_count(text, lit(UrlRe)))
      .withColumn("n_phones", regexp_count(text, lit(PhoneRe)))
      .withColumn("clean_text", cleaned)
  }
}
