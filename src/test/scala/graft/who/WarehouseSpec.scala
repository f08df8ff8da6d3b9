package graft.who

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WarehouseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("createSchema: creates all tables idempotently") {
    val wh = tempDir("wh-ddl")
    Warehouse.createSchema(spark, wh)
    Warehouse.tables.keys.foreach { t =>
      assert(Warehouse.readTable(spark, wh, t).count() === 0)
    }
    // second call is a no-op (does not wipe data)
    Seq((1L, "X", "US", "C", 2020, "Y", Some(1.0), Some("1")))
      .toDF(Warehouse.factObservation.fieldNames: _*)
      .write.mode("append").parquet(s"$wh/fact_observation")
    Warehouse.createSchema(spark, wh)
    assert(Warehouse.readTable(spark, wh, "fact_observation").count() === 1)
  }

  test("createSchema: migration drops a legacy fact table lacking observation_id") {
    val wh = tempDir("wh-mig")
    // legacy shape without observation_id (reference etl/load.py:20-24)
    Seq(("X", "US", 2020)).toDF("indicator_code", "spatial_dim", "time_dim")
      .write.parquet(s"$wh/fact_observation")
    Warehouse.createSchema(spark, wh)
    val fact = Warehouse.readTable(spark, wh, "fact_observation")
    assert(fact.schema.fieldNames.contains("observation_id"))
    assert(fact.count() === 0) // recreated empty
  }

  test("Config parsing matches the reference's permissive semantics") {
    assert(Config.parseBool(" TRUE "))
    assert(Config.parseBool("1"))
    assert(Config.parseBool("y"))
    assert(!Config.parseBool("on")) // reference's truthy set is {1,true,yes,y}
    assert(!Config.parseBool("nope"))
    assert(!Config.parseBool(null, default = false))
    assert(Config.parseBool(null, default = true))
    assert(Config.parseList("A, B,,C , ") === Seq("A", "B", "C"))
    assert(Config.parseList(null) === Nil)
    assert(Config.parseInt("42", 7) === 42)
    assert(Config.parseInt("x", 7) === 7)
    val cfg = Config.fromEnv(
      Map("WHO_INDICATOR_CODES" -> "A,B", "DEV_RUN_LIMIT" -> "10",
        "SKIP_REQUEST_ERRORS" -> "false"),
      "/tmp/wh", "/tmp/state")
    assert(cfg.indicatorCodes === Seq("A", "B"))
    assert(cfg.devRunLimit === Some(10))
    assert(!cfg.skipRequestErrors)
  }
}
