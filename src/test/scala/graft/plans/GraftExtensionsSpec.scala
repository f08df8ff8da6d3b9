package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("extension injection registers every function without error") {
    // a fresh extensions container (the shared test session is already
    // instantiated, so withExtensions can't be exercised end-to-end here;
    // injection exercises the same builders the registry path uses)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("shared builders decode literal matrices like the register path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.CatalystTypeConverters
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val matrix = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val lit = Literal(
      CatalystTypeConverters.convertToCatalyst(matrix),
      ArrayType(ArrayType(DoubleType)))
    val vec = Literal(
      CatalystTypeConverters.convertToCatalyst(Seq(3.0, -4.0)),
      ArrayType(DoubleType))
    val sig = SignLshBits.builder(Seq(vec, lit))
    assert(sig.eval() === 1L) // dot>=0 on plane 0 only → bit 0
    val nc = NearestCentroid.builder(Seq(vec, lit))
    assert(nc.eval() === 0)   // closer to (1,0) than (0,1)
  }
}
