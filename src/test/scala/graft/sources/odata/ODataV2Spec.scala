package graft.sources.odata

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.PageFetcher

import scala.collection.concurrent.TrieMap

/** Records every URL fetched, serves deterministic observation pages. The
  * factory is instantiated per partition (executor-side in cluster mode), so
  * the URL log lives in a companion TrieMap — fine in local[=] tests. */
class StubFetcherFactory extends PageFetcherFactory {
  override def create(): PageFetcher = new PageFetcher {
    override def fetch(url: String): (Int, String) = {
      StubFetcherFactory.urls.put(url, true)
      val body =
        if (url.contains("%27USA%27"))
          """{"value": [
             {"Id": 1, "IndicatorCode": "IND_A", "SpatialDim": "USA", "TimeDim": "2019", "Value": "78.5"},
             {"Id": 2, "IndicatorCode": "IND_A", "SpatialDim": "USA", "TimeDim": "2020", "Value": "79.1"}]}"""
        else if (url.contains("%27CAN%27"))
          """{"value": [
             {"Id": 3, "IndicatorCode": "IND_A", "SpatialDim": "CAN", "TimeDim": "2019", "Value": "82.0"}]}"""
        else if (url.contains("/Indicator?"))
          """{"value": [
             {"IndicatorCode": "IND_A", "IndicatorName": "A", "Language": "EN"},
             {"IndicatorCode": "IND_B", "IndicatorName": "B", "Language": "EN"}]}"""
        else """{"value": []}"""
      (200, body)
    }
  }
}

object StubFetcherFactory {
  val urls: TrieMap[String, Boolean] = TrieMap.empty
  def reset(): Unit = urls.clear()
  def fetched: Seq[String] = urls.keys.toSeq
}

/** Transport always down — for the error-mode forwarding test. */
class DownFetcherFactory extends PageFetcherFactory {
  override def create(): PageFetcher = new PageFetcher {
    override def fetch(url: String): (Int, String) =
      throw new graft.sources.TransportException("connection refused")
  }
}

class ODataV2Spec extends AnyFunSuite with SparkSpec {

  private def read(extra: (String, String)*) = {
    val base = spark.read.format("graft-odata")
      .option("baseUrl", "http://t/api")
      .option("fetcherClass", classOf[StubFetcherFactory].getName)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("single entity-set scan via short name") {
    StubFetcherFactory.reset()
    val df = read(
      "entitySet" -> "Indicator",
      "columns" -> "IndicatorCode,IndicatorName,Language")
    assert(df.collect().map(_.getString(0)).sorted.toSeq === Seq("IND_A", "IND_B"))
  }

  test("observation mode: one partition per (indicator,country)") {
    StubFetcherFactory.reset()
    val df = read(
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA,CAN",
      "columns" -> "Id,IndicatorCode,SpatialDim,TimeDim,Value")
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 3)
  }

  test("SpatialDim equality filter is pushed: untouched partitions never fetch") {
    StubFetcherFactory.reset()
    val df = read(
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA,CAN",
      "columns" -> "Id,IndicatorCode,SpatialDim,TimeDim,Value")
      .filter(col("SpatialDim") === "USA")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedSpatialDims=USA"), s"plan was:\n$plan")
    assert(df.count() === 2)
    // the CAN partition was pruned away — its URL never requested
    assert(StubFetcherFactory.fetched.forall(!_.contains("%27CAN%27")))
  }

  test("SpatialDim IN-list prunes the partition grid to the listed countries") {
    StubFetcherFactory.reset()
    val df = read(
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA,CAN,MEX",
      "columns" -> "Id,IndicatorCode,SpatialDim,TimeDim,Value")
      .filter(col("SpatialDim").isin("USA", "CAN"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedSpatialDims=USA,CAN") ||
      plan.contains("pushedSpatialDims=CAN,USA"), s"plan was:\n$plan")
    assert(df.count() === 3) // USA 2 rows + CAN 1
    // MEX partition pruned — never fetched
    assert(StubFetcherFactory.fetched.forall(!_.contains("%27MEX%27")))
  }

  test("entitySet mode does NOT claim the SpatialDim filter (would be silently wrong)") {
    StubFetcherFactory.reset()
    val df = read(
      "entitySet" -> "Indicator",
      "columns" -> "IndicatorCode,IndicatorName,Language")
      .filter(col("IndicatorCode") === "IND_A")
    // the unclaimed filter must be re-applied by Spark post-scan
    assert(df.collect().map(_.getString(0)).toSeq === Seq("IND_A"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedSpatialDims=none"), plan)
  }

  test("column pruning reaches the reader schema") {
    StubFetcherFactory.reset()
    val df = read(
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA",
      "columns" -> "Id,IndicatorCode,SpatialDim,TimeDim,Value")
      .select("Id", "TimeDim")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<Id:string,TimeDim:string>") ||
      df.schema.fieldNames.toSeq == Seq("Id", "TimeDim"))
    assert(df.collect().map(_.getString(1)).sorted.toSeq === Seq("2019", "2020"))
  }

  test("runtime V2 filtering prunes the partition grid from a join key set") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.unsafe.types.UTF8String
    import scala.jdk.CollectionConverters._

    val opts = new CaseInsensitiveStringMap(Map(
      "baseUrl" -> "http://t/api",
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA,CAN,MEX",
      "columns" -> "Id,SpatialDim").asJava)
    val scan = new ODataScan(
      ODataDataSource.schemaFromOptions(opts), opts, None, None)
    // scan exposes SpatialDim as runtime-filterable in observation mode
    assert(scan.filterAttributes().map(_.describe()).toSeq === Seq("SpatialDim"))
    assert(scan.planInputPartitions().length === 3)

    // Spark hands the broadcast join key set here at runtime (DPP)
    scan.filter(Array(new Predicate("IN", Array(
      Expressions.column("SpatialDim"),
      Expressions.literal(UTF8String.fromString("USA")),
      Expressions.literal(UTF8String.fromString("CAN"))))))
    val parts = scan.planInputPartitions()
      .map(_.asInstanceOf[ODataInputPartition].label).sorted.toSeq
    assert(parts === Seq("IND_A_CAN", "IND_A_USA")) // MEX never fetched

    // unrelated predicates are ignored, not misapplied
    scan.filter(Array(new Predicate("=", Array(
      Expressions.column("Id"),
      Expressions.literal(UTF8String.fromString("1"))))))
    assert(scan.planInputPartitions().length === 2)
  }

  test("column pruning pushes $select into the request URL") {
    StubFetcherFactory.reset()
    val df = read(
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA",
      "columns" -> "Id,IndicatorCode,SpatialDim,TimeDim,Value")
      .select("Id", "TimeDim")
    assert(df.collect().map(_.getString(1)).sorted.toSeq === Seq("2019", "2020"))
    val urls = StubFetcherFactory.fetched
    assert(urls.nonEmpty)
    assert(urls.forall(_.contains("%24select=Id%2CTimeDim")),
      s"expected pushed \\$$select in every URL, got:\n${urls.mkString("\n")}")
  }

  test("unpruned scan sends no $select") {
    StubFetcherFactory.reset()
    val df = read(
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA",
      "columns" -> "Id,IndicatorCode,SpatialDim,TimeDim,Value")
    assert(df.count() === 2)
    assert(StubFetcherFactory.fetched.forall(!_.contains("select")))
  }

  test("skipRequestErrors is honored by the scan: skip → empty, strict → fail") {
    def down(skip: String) = spark.read.format("graft-odata")
      .option("baseUrl", "http://t/api")
      .option("fetcherClass", classOf[DownFetcherFactory].getName)
      .option("indicatorCodes", "IND_A")
      .option("countryCodes", "USA")
      .option("columns", "Id,SpatialDim")
      .option("skipRequestErrors", skip)
      .load()
    assert(down("true").count() === 0) // transport error → empty page, run continues
    val e = intercept[org.apache.spark.SparkException] { down("false").count() }
    assert(e.getMessage.contains("connection refused") ||
      Option(e.getCause).exists(_.getMessage.contains("connection refused")))
  }

  test("limit pushdown stops paging at the source") {
    StubFetcherFactory.reset()
    val df = read(
      "indicatorCodes" -> "IND_A",
      "countryCodes" -> "USA",
      "columns" -> "Id,SpatialDim",
      "pageSize" -> "2")
      .limit(1)
    assert(df.count() === 1)
    // page 1 satisfied the limit: no $skip=2 request
    assert(StubFetcherFactory.fetched.forall(!_.contains("skip=2")))
  }

  test("resume: a crash mid-scan refetches ONLY the unfinished pairs on re-run") {
    CrashingFetcherFactory.reset()
    val dir = tempDir("odata-resume")
    def scan() = spark.read.format("graft-odata")
      .option("baseUrl", "http://t/api")
      .option("fetcherClass", classOf[CrashingFetcherFactory].getName)
      .option("indicatorCodes", "IND_A")
      .option("countryCodes", "USA,CAN")
      .option("columns", "Id,IndicatorCode,SpatialDim,TimeDim,Value")
      .option("skipRequestErrors", "false")
      .option("resumeDir", dir)
      .load()

    // run 1: the CAN partition dies mid-scan (USA completes and persists)
    CrashingFetcherFactory.crashOnCan.set(true)
    intercept[org.apache.spark.SparkException] { scan().count() }
    assert(CrashingFetcherFactory.fetchCount("%27USA%27") === 1)

    // run 2: CAN recovers; USA must be served from its completion record
    CrashingFetcherFactory.crashOnCan.set(false)
    val rows = scan().collect()
    assert(rows.length === 3) // USA 2 + CAN 1, nothing lost through the cache
    assert(rows.map(_.getString(2)).sorted.toSeq === Seq("CAN", "USA", "USA"))
    assert(CrashingFetcherFactory.fetchCount("%27USA%27") === 1,
      "completed pair was refetched despite a resume record")
    assert(CrashingFetcherFactory.fetchCount("%27CAN%27") >= 1)
  }

  test("resume records key on the query fingerprint — a changed pushdown refetches") {
    CrashingFetcherFactory.reset()
    CrashingFetcherFactory.crashOnCan.set(false)
    val dir = tempDir("odata-resume-fp")
    def scan() = spark.read.format("graft-odata")
      .option("baseUrl", "http://t/api")
      .option("fetcherClass", classOf[CrashingFetcherFactory].getName)
      .option("indicatorCodes", "IND_A")
      .option("countryCodes", "USA")
      .option("columns", "Id,IndicatorCode,SpatialDim,TimeDim,Value")
      .option("resumeDir", dir)
      .load()
    assert(scan().count() === 2)
    assert(CrashingFetcherFactory.fetchCount("%27USA%27") === 1)
    // a pruned projection pushes $select → different query fingerprint →
    // the unpruned record must NOT be served for it (collect, not count:
    // count prunes to an EMPTY schema, which sends no $select at all)
    assert(scan().select("Id", "SpatialDim").collect().length === 2)
    assert(CrashingFetcherFactory.fetchCount("%27USA%27") === 2)
    // identical pruned query again → served from its own record
    assert(scan().select("Id", "SpatialDim").collect().length === 2)
    assert(CrashingFetcherFactory.fetchCount("%27USA%27") === 2)
  }
}

/** Serves the stub pages, crashes the CAN pair while `crashOnCan` is set,
  * and counts fetches per URL substring. */
class CrashingFetcherFactory extends PageFetcherFactory {
  override def create(): PageFetcher = new PageFetcher {
    override def fetch(url: String): (Int, String) = {
      if (url.contains("%27CAN%27") && CrashingFetcherFactory.crashOnCan.get())
        throw new graft.sources.TransportException("simulated mid-scan crash")
      CrashingFetcherFactory.urls.updateWith(url) {
        case Some(n) => Some(n + 1); case None => Some(1)
      }
      val body =
        if (url.contains("%27USA%27"))
          """{"value": [
             {"Id": 1, "IndicatorCode": "IND_A", "SpatialDim": "USA", "TimeDim": "2019", "Value": "78.5"},
             {"Id": 2, "IndicatorCode": "IND_A", "SpatialDim": "USA", "TimeDim": "2020", "Value": "79.1"}]}"""
        else if (url.contains("%27CAN%27"))
          """{"value": [
             {"Id": 3, "IndicatorCode": "IND_A", "SpatialDim": "CAN", "TimeDim": "2019", "Value": "82.0"}]}"""
        else """{"value": []}"""
      (200, body)
    }
  }
}

object CrashingFetcherFactory {
  val urls: TrieMap[String, Int] = TrieMap.empty
  val crashOnCan = new java.util.concurrent.atomic.AtomicBoolean(false)
  def reset(): Unit = { urls.clear(); crashOnCan.set(false) }
  def fetchCount(substr: String): Int =
    urls.collect { case (u, n) if u.contains(substr) => n }.sum
}
