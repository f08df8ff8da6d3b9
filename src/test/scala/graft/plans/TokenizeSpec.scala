package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The load-bearing identity behind swapping the text operators onto the
  * native tokenizer: `graft_tokens(s)` must equal
  * `split(lower(trim(s)), '\s+')` ELEMENT FOR ELEMENT on every string —
  * including the edge shapes Java split semantics produce (leading ""
  * from a tab-edged string, trailing "" at limit -1, [""] for empty). */
class TokenizeSpec extends AnyFunSuite with SparkSpec {

  private def bothForms(strings: Seq[String]): Seq[(String, Seq[String], Seq[String])] = {
    import spark.implicits._
    Tokenize.register(spark)
    strings.toDF("s")
      .select(col("s"),
        call_function("graft_tokens", col("s")).as("kernel"),
        split(lower(trim(col("s"))), "\\s+").as("expr"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toSeq, r.getSeq[String](2).toSeq))
      .toSeq
  }

  test("kernel == split(lower(trim(s)), '\\s+') on adversarial edge shapes") {
    val cases = Seq(
      "", " ", "   ", "\t", "\n", "a", "A B", "  a  b  ",
      "\ta b\n", "\r\na\tb\u000B c\fd", "a b", // NBSP must NOT split
      "Ünïcödé STRASSE ß", "日本語 テスト", "a\tb", "word",
      "mixed thin space", // U+2009 is not \s without UNICODE flag
      "ends with tab\t", "\tstarts with tab", "a  \t\n  b")
    bothForms(cases).foreach { case (s, kernel, expr) =>
      assert(kernel === expr, s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  test("kernel == expression form on random corpora (fuzz)") {
    val alphabet = "ab CD\t\n é日\r .xyz"
    val rnd = new scala.util.Random(7)
    val cases = (1 to 300).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    bothForms(cases).foreach { case (s, kernel, expr) =>
      assert(kernel === expr, s"input=${s.map(_.toInt).mkString(",")}")
    }
  }

  test("kernel rejects non-string input at analysis time") {
    import spark.implicits._
    Tokenize.register(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(call_function("graft_tokens", col("x"))).collect()
    }
  }
}
