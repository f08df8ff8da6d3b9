package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, WhoFixtures}
import graft.who.{Transform, ValidateWho}

/** Property-based validation invariants (SURVEY.md §5 test plan): for random
  * raw observation frames with missing/corrupt fields, the dead-letter split
  * is a partition — valid + rejected == input, no row lost or duplicated —
  * and every rejected row carries an error message. (Raw ScalaCheck with
  * seeded sampling — the scalatest-scalacheck bridge isn't in the offline
  * dependency cache.) */
class ValidatePropertySpec extends AnyFunSuite with SparkSpec {

  private val fieldGen: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(8)),
    2 -> Gen.const(null.asInstanceOf[String]),
    1 -> Gen.numStr.map(_.take(6)),
    1 -> Gen.const("2020-2021"))

  private val rowGen: Gen[Seq[Any]] = for {
    id <- Gen.frequency(4 -> Gen.choose(1, 99999).map(_.toString),
      1 -> Gen.const(null.asInstanceOf[String]), 1 -> Gen.const("not-a-number"))
    ind <- fieldGen; spa <- fieldGen; spaT <- fieldGen
    time <- Gen.frequency(3 -> Gen.choose(1900, 2030).map(_.toString),
      1 -> Gen.const(null.asInstanceOf[String]), 1 -> Gen.const("bad-year"))
    timeT <- fieldGen
    num <- Gen.frequency(2 -> Gen.choose(0.0, 100.0).map(_.toString),
      1 -> Gen.const(null.asInstanceOf[String]), 1 -> Gen.const("NaNish"))
    v <- fieldGen
  } yield Seq(id, ind, spa, spaT, time, timeT, num, v)

  test("validation split is a partition of the transformed input") {
    val frameGen = Gen.listOfN(40, rowGen)
    (0 until 8).foreach { trial =>
      val rows = frameGen(Gen.Parameters.default, Seed(42L + trial))
        .getOrElse(fail(s"generator exhausted at trial $trial"))
      val raw = df(WhoFixtures.obsSchema, rows)
      val transformed = Transform.transformObservations(raw).cache()
      val (valid, rejected) = ValidateWho.validateObservations(transformed)
      val nIn = transformed.count()
      val nValid = valid.count()
      val nRej = rejected.count()
      assert(nValid + nRej === nIn, s"split not a partition: $nValid + $nRej != $nIn")
      assert(rejected.filter(col("error_details") === "").count() === 0)
      // typed side honors the model: required fields non-null
      assert(valid.filter(col("indicator_code").isNull ||
        col("spatial_dim").isNull || col("time_dim").isNull).count() === 0)
      transformed.unpersist()
      ()
    }
  }

  test("upsert idempotence property: applying the same batch twice == once") {
    val frameGen = Gen.listOfN(30, rowGen)
    (0 until 4).foreach { trial =>
      val rows = frameGen(Gen.Parameters.default, Seed(1000L + trial))
        .getOrElse(fail("generator exhausted"))
      val raw = df(WhoFixtures.obsSchema, rows)
      val (valid, _) = ValidateWho.validateObservations(
        Transform.transformObservations(raw))
      val batch = valid.toDF()
      val once = Upsert.upsert(batch, batch, Seq("observation_id"),
        Seq(col("observation_id")))
      assert(once.count() === batch.count())
      ()
    }
  }
}
