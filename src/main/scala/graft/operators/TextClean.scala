package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing / text cleaning for training corpora: redact emails,
  * URLs, and phone numbers behind typed placeholder tokens, reporting
  * per-document redaction counts.
  *
  * Pure per-row projection — codegen'd `regexp_replace`/
  * `regexp_extract_all`, no shuffle, no UDF: scrubbing 100 TB is one scan.
  * Patterns avoid constructs where Java regex (Spark, backtracking
  * leftmost-first) and RE2 (DuckDB/oracle, leftmost-longest) could
  * disagree: greedy character classes and fixed-width digit groups only.
  * The combined alternation below is safe on the same grounds — the three
  * branches are prefix-disjoint (URL needs a literal `http`, email's local
  * part cannot contain the space a phone requires before reaching `@`,
  * phone needs `+digit`), so at any scan position at most one branch can
  * match and leftmost-first vs leftmost-longest pick identically.
  *
  * Counts come from ONE left-to-right scan of the combined alternation and
  * classify each hit by its surface shape — i.e. they count exactly the
  * spans the scrub redacts, with URL listed first so an address inside a
  * query string is swallowed by `<URL>` rather than double-counted (the
  * pre-round-13 form ran three independent `regexp_count` passes plus
  * three nested replaces — six traversals of every document where four
  * suffice; at sf1 the regex passes dominated the query wall).
  */
object TextClean {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  /** +C[C] NNN-NNNN international-ish form; fixed-width groups for
    * engine-portable matching. */
  val PhoneRe = "\\+[0-9]{1,2} [0-9]{3}-[0-9]{4}"
  /** One scan, three categories; URL first (see classification note). */
  val PiiRe = s"(?:$UrlRe)|(?:$EmailRe)|(?:$PhoneRe)"

  /** Adds `clean_text`, `n_emails`, `n_urls`, `n_phones`. Four text
    * traversals total: one `regexp_extract_all` for all three counts,
    * three replaces for the typed placeholders (`regexp_replace` cannot
    * vary the replacement per alternation branch). */
  def scrubPii(df: DataFrame, text: Column): DataFrame = {
    val cleaned =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")
    // classification mirrors the branch that matched: the URL branch is
    // the only one that can produce a hit starting with http; a non-URL
    // hit containing '@' is the email branch; the rest is phone. The
    // classifying aggregate runs INSIDE one expression over the extracted
    // array, so the regex scan happens exactly once per row no matter how
    // Catalyst collapses the surrounding projections — the three counts
    // are unpacked from the struct afterwards (cheap field accesses).
    val counts = aggregate(
      regexp_extract_all(text, lit(PiiRe), lit(0)),
      struct(lit(0).as("u"), lit(0).as("e"), lit(0).as("p")),
      (acc, h) =>
        when(h.startsWith("http"),
            struct((acc("u") + 1).as("u"), acc("e").as("e"), acc("p").as("p")))
          .when(h.contains("@"),
            struct(acc("u").as("u"), (acc("e") + 1).as("e"), acc("p").as("p")))
          .otherwise(
            struct(acc("u").as("u"), acc("e").as("e"), (acc("p") + 1).as("p"))))
    df.withColumn("pii_counts", counts)
      .withColumn("n_emails", col("pii_counts.e"))
      .withColumn("n_urls", col("pii_counts.u"))
      .withColumn("n_phones", col("pii_counts.p"))
      .drop("pii_counts")
      .withColumn("clean_text", cleaned)
  }
}
