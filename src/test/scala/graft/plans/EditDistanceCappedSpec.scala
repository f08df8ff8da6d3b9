package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class EditDistanceCappedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String, cap: Int): Int =
    EditDistanceCapped.capped(
      UTF8String.fromString(a), UTF8String.fromString(b), cap)

  test("matches the built-in levenshtein exactly for every distance <= cap") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcde" // small alphabet → dense distance spectrum
    def randStr() = (0 until rnd.nextInt(30)).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString
    val pairs = Seq.fill(500)((randStr(), randStr()))
    val expected = pairs.toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).collect().map(_.getInt(0))
    pairs.zip(expected).foreach { case ((a, b), d) =>
      Seq(0, 1, 3, 10, 50).foreach { cap =>
        val got = lev(a, b, cap)
        if (d <= cap) assert(got === d, s"('$a','$b') cap=$cap")
        else assert(got === -1, s"('$a','$b') cap=$cap d=$d")
      }
    }
  }

  test("edges: empty strings, identical strings, unicode code points") {
    assert(lev("", "", 0) === 0)
    assert(lev("", "abc", 3) === 3)
    assert(lev("", "abc", 2) === -1)
    assert(lev("same", "same", 0) === 0)
    // multibyte code points count as ONE unit, like the built-in
    val d = Seq(("héllo", "hello")).toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).head().getInt(0)
    assert(lev("héllo", "hello", 5) === d)
    assert(d === 1)
  }

  test("expression survives codegen and the registry builder rejects a non-literal cap") {
    EditDistanceCapped.register(spark)
    val out = Seq(("kitten", "sitting"), ("abc", "xyz998877")).toDF("a", "b")
      .select(call_function("graft_edit_distance", col("a"), col("b"), lit(3)).as("d"))
      .collect().map(_.getInt(0))
    assert(out.toSeq === Seq(3, -1))
    intercept[IllegalArgumentException] {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      EditDistanceCapped.builder(Seq(
        UnresolvedAttribute("a"), UnresolvedAttribute("b"), UnresolvedAttribute("c")))
    }
  }

  test("editDistancePairs is unchanged by the kernel swap (vs built-in formulation)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumped over the lazy dog", "web"),
      (3L, "a completely different document body here", "web"),
      (4L, "the quick brown fox jumps over the lazy dot", "web"))
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")))
    val out = graft.operators.TextDedup
      .editDistancePairs(docs, maxDistance = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference: built-in levenshtein over the same blocked pairs
    val d = docs.select(col("doc_id"), col("source").as("__blk"),
      floor(col("n_chars") / 10).cast("int").as("len_bucket"),
      substring(col("text"), 1, 80).as("prefix"))
    val ref = d.as("a").join(d.as("b"),
        col("a.__blk") === col("b.__blk") &&
          col("a.len_bucket") === col("b.len_bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        levenshtein(col("a.prefix"), col("b.prefix")).as("d"))
      .filter(col("d") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out === ref)
    assert(out.nonEmpty)
  }
}
