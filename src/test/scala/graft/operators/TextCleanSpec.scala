package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextCleanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("scrubPii redacts emails, urls, phones and counts them") {
    val in = Seq(
      (1L, "mail a.b+c@ex-ample.org or see https://x.io/p?q=1 call +1 555-0123"),
      (2L, "no pii here"),
      (3L, "two mails: a@b.co c@d.io")
    ).toDF("id", "text")
    val out = TextClean.scrubPii(in, col("text")).collect()
      .map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getAs[String]("clean_text") ===
      "mail <EMAIL> or see <URL> call <PHONE>")
    assert(r1.getAs[Int]("n_emails") === 1)
    assert(r1.getAs[Int]("n_urls") === 1)
    assert(r1.getAs[Int]("n_phones") === 1)

    assert(out(2L).getAs[String]("clean_text") === "no pii here")
    assert(out(2L).getAs[Int]("n_emails") === 0)

    assert(out(3L).getAs[String]("clean_text") === "two mails: <EMAIL> <EMAIL>")
    assert(out(3L).getAs[Int]("n_emails") === 2)
  }

  test("an email inside a URL is swallowed by the URL placeholder") {
    val in = Seq((1L, "link https://x.io/login?user=a@b.co end")).toDF("id", "text")
    val out = TextClean.scrubPii(in, col("text")).head()
    assert(out.getAs[String]("clean_text") === "link <URL> end")
    // counts come from the SAME single left-to-right scan the scrub uses
    // (round 13): the span is redacted as <URL>, so it counts as a URL and
    // NOT additionally as an email — counts always agree with clean_text
    assert(out.getAs[Int]("n_emails") === 0)
    assert(out.getAs[Int]("n_urls") === 1)
  }

  test("standalone pii of all three kinds classifies from one scan") {
    val in = Seq((1L, "+12 345-6789 then a@b.co then http://e.f/g?h=i@j.kl")).toDF("id", "text")
    val out = TextClean.scrubPii(in, col("text")).head()
    assert(out.getAs[String]("clean_text") === "<PHONE> then <EMAIL> then <URL>")
    assert(out.getAs[Int]("n_phones") === 1)
    assert(out.getAs[Int]("n_emails") === 1)
    assert(out.getAs[Int]("n_urls") === 1)
  }
}
