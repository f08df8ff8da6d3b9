package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The fused quality-counts kernel must reproduce the regex forms it
  * replaced, byte for byte, on every class of input the regexes
  * distinguish — including the cases the scan's shortcuts lean on
  * (non-ASCII code points, case-folding, overlap consumption). */
class QualityKernelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val nasty = Seq(
    "plain words only",
    "digits 123 and 456x7",
    "punct! marks? (all) over; here:",
    "under_scores_are_word chars",
    "tabs\tand\nnewlines\randvt\fff",
    "unicode café straße über",     // 2-byte code points
    "emoji 😀 and 🚀 fly",     // 4-byte (surrogate pairs)
    "the the the",                                  // overlap consumption
    " the the ",                                    // boundary-space sharing
    "THE The tHe",                                  // case folding
    "Kelvin K sign",                           // U+212A lowercases to k
    "athe thea ther",                               // no padded-space match
    "",                                             // empty
    "the",                                          // pattern == whole text
    "...ellipsis #hash 50% $5")

  test("kernel counts == regex counts on adversarial inputs") {
    CharClassCounts.register(spark)
    val df = nasty.toDF("text")
    val text = col("text")
    val nChars = length(text)
    val regex = df.select(
      (nChars - length(regexp_replace(text, "[^a-zA-Z0-9_\\s]", ""))).cast("long").as("p"),
      (nChars - length(regexp_replace(text, "[0-9]", ""))).cast("long").as("d"),
      ((length(concat(lit(" "), lower(text), lit(" "))) -
        length(call_function("replace",
          concat(lit(" "), lower(text), lit(" ")), lit(" the "), lit("")))) / 5)
        .cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val kernel = df.select(call_function("graft_quality_counts", text).as("c"))
      .select(col("c.n_punct"), col("c.n_digits"), col("c.n_stop"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    nasty.indices.foreach { i =>
      assert(kernel(i) === regex(i), s"mismatch on '${nasty(i).take(40)}'")
    }
  }

  // every class split/trim distinguish: pure spaces (trim → "" → [""]),
  // leading/trailing NON-space \s (trim keeps them; split emits leading
  // and — with limit −1 — trailing empties), interior runs, NBSP (neither
  // trimmed nor \s), and the empty string
  private val wsEdges = Seq(
    "", " ", "   ", "\t", " \t ", "\tabc", "abc\t", " \t abc  ",
    "a  b\t\tc", " x ", " nbsp  x", "a\rb\ncd\fe",
    "multi  spaced   words", "\n", "  \t\t  ")

  test("kernel n_ws_tokens == size(split(trim(text), \\s+, -1)) exactly") {
    CharClassCounts.register(spark)
    val all = nasty ++ wsEdges
    val df = all.toDF("text")
    val viaSplit = df
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("t"))
      .collect().map(_.getLong(0))
    val viaKernel = df
      .select(call_function("graft_quality_counts", col("text"))
        .getField("n_ws_tokens").as("t"))
      .collect().map(_.getLong(0))
    all.indices.foreach { i =>
      assert(viaKernel(i) === viaSplit(i),
        s"mismatch on '${all(i).take(40).replace("\t", "\\t")}'")
    }
  }

  test("interpreted eval == codegen path") {
    // nullSafeEval directly vs the registered (codegen'd) column
    CharClassCounts.register(spark)
    val viaEval = nasty.map { s =>
      val r = CharClassCounts.counts(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val viaPlan = nasty.toDF("text")
      .select(call_function("graft_quality_counts", col("text")).as("c"))
      .select(col("c.n_punct"), col("c.n_digits"), col("c.n_stop"),
        col("c.n_ws_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(viaEval === viaPlan)
  }

  test("null text stays null") {
    CharClassCounts.register(spark)
    val out = Seq[Option[String]](None, Some("x"))
      .toDF("text")
      .select(call_function("graft_quality_counts", col("text")).as("c"))
      .collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }
}
