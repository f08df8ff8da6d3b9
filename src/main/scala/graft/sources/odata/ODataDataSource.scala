package graft.sources.odata

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

import graft.sources.{ODataClient, PageFetcher}

/** DataSource V2 connector for paged OData APIs — the Spark-native form of
  * the reference's extraction layer (reference etl/extract.py), where the
  * hand-rolled optimizations become Catalyst contracts:
  *
  *  - `$filter=SpatialDim eq '…'` pushdown (extract.py:137-142) →
  *    [[SupportsPushDownFilters]]: an `EqualTo("SpatialDim", v)` predicate is
  *    consumed by the source and sent to the server;
  *  - `dev_run_limit` early termination (extract.py:70-73) →
  *    [[SupportsPushDownLimit]]: paging stops at the limit;
  *  - per-(indicator, country) fetch loops (extract.py:129-151) →
  *    [[InputPartition]]s: what the reference runs sequentially becomes one
  *    Spark task per pair, giving cluster-wide parallel extraction;
  *  - column selection → [[SupportsPushDownRequiredColumns]] (records are
  *    projected at parse time, rows never carry dropped fields).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-odata")
  *     .option("baseUrl", "https://ghoapi.azureedge.net/api")
  *     .option("columns", "Id,IndicatorCode,SpatialDim,TimeDim,Value")
  *     .option("indicatorCodes", "WHOSIS_000001")      // observation mode
  *     .option("countryCodes", "USA,CAN")               //   (one partition per pair)
  *     // or .option("entitySet", "Indicator")          // single-set mode
  *     .option("fetcherClass", "graft.sources.HttpPageFetcherFactory")
  *     .load()
  * }}}
  *
  * `fetcherClass` names a no-arg [[PageFetcherFactory]] so executors
  * construct their own transport (HTTP in production, deterministic stubs in
  * tests) — nothing non-serializable crosses the driver/executor boundary.
  *
  * **Resume** (`resumeDir` option): the parallel analog of the sequential
  * client's per-page checkpointing (reference etl/extract.py:80-87). Each
  * partition that fetches to completion persists its records to
  * `resumeDir/<label>_<query-fingerprint>.jsonl` on shared storage via an
  * atomic tmp+rename, and a reader whose completion file already exists
  * serves it WITHOUT touching the API — so a crash at pair 9,990 of 10,000
  * refetches only the unfinished pairs on re-run. The fingerprint covers
  * the full entity-set query ($filter/$select/params), so a changed
  * pushdown never serves stale rows; callers own the directory lifecycle
  * (create per logical run, delete after downstream success — see
  * [[graft.who.Pipeline]]). Without the option the scan is a pure read.
  */
class ODataDataSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-odata"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ODataDataSource.schemaFromOptions(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ODataTable(schema, new CaseInsensitiveStringMap(properties))
}

object ODataDataSource {
  /** Permissive all-string schema from the `columns` option — the
    * schema-on-read contract of the reference ingest. */
  def schemaFromOptions(options: CaseInsensitiveStringMap): StructType = {
    val cols = Option(options.get("columns"))
      .getOrElse(throw new IllegalArgumentException("graft-odata requires a 'columns' option"))
    StructType(cols.split(",").map(_.trim).filter(_.nonEmpty)
      .map(StructField(_, StringType, nullable = true)))
  }
}

/** Factory seam: executors instantiate the transport themselves. */
trait PageFetcherFactory extends Serializable {
  def create(): PageFetcher
}

/** Default: real HTTP transport. */
class HttpPageFetcherFactory extends PageFetcherFactory {
  override def create(): PageFetcher = new graft.sources.HttpPageFetcher()
}

class ODataTable(schema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  override def name(): String =
    s"odata:${options.getOrDefault("baseUrl", "?")}"

  override def schema(): StructType = schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ODataScanBuilder(schema, options)
}

class ODataScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
  extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownRequiredColumns {

  private var pushedSpatialDims: Option[Seq[String]] = None
  private var claimed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var readSchema: StructType = fullSchema

  /** Consume `SpatialDim = '<v>'` or `SpatialDim IN (...)` (the country
    * predicates the partition grid can apply, the first as the reference
    * pushes it server-side); everything else stays for Spark. Only
    * claimable in OBSERVATION mode (indicatorCodes set), where the grid
    * actually applies it — claiming it in single-entitySet mode would
    * silently return unfiltered rows. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val observationMode =
      options.getOrDefault("indicatorCodes", "").split(",").exists(_.trim.nonEmpty)
    val (pushable, rest) = filters.partition {
      case EqualTo("SpatialDim", v: String)
          if observationMode && pushedSpatialDims.isEmpty =>
        pushedSpatialDims = Some(Seq(v)); true
      case In("SpatialDim", vs)
          if observationMode && pushedSpatialDims.isEmpty &&
            vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        pushedSpatialDims = Some(vs.toSeq.map(_.asInstanceOf[String])); true
      case _ => false
    }
    claimed = pushable
    rest // Spark re-applies only these
  }

  override def pushedFilters(): Array[Filter] = claimed

  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    false // partial: paging stops at the limit but may overshoot in-page
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    readSchema = requiredSchema

  override def build(): Scan = {
    // pruned scan → OData `$select`: the server stops SENDING the dropped
    // fields instead of the reader dropping them at parse time
    val selectCols =
      if (readSchema.fields.nonEmpty &&
          readSchema.fieldNames.toSeq != fullSchema.fieldNames.toSeq)
        Some(readSchema.fieldNames.mkString(","))
      else None
    new ODataScan(readSchema, options, pushedSpatialDims, limit, selectCols)
  }
}

class ODataScan(readSchema: StructType, options: CaseInsensitiveStringMap,
                pushedSpatialDims: Option[Seq[String]], limit: Option[Int],
                selectCols: Option[String] = None)
  extends Scan with Batch with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = readSchema

  override def toBatch: Batch = this

  /** Countries injected at RUNTIME (dynamic partition pruning): when this
    * scan joins a dim whose filtered SpatialDim values are known only after
    * the build side executes, Spark hands them here and the partition grid
    * shrinks before any task launches — (indicator,country) pairs outside
    * the join key set are never fetched. */
  @volatile private var runtimeSpatialDims: Option[Set[String]] = None

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val observationMode =
      options.getOrDefault("indicatorCodes", "").split(",").exists(_.trim.nonEmpty)
    if (observationMode)
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("SpatialDim"))
    else Array.empty
  }

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    // A runtime filter must be applied FULLY or not at all: a value child
    // we cannot decode would shrink the key set and prune partitions whose
    // rows should survive — silently missing rows. Accept a predicate only
    // when every value child is a literal.
    def allStringValues(children: Array[org.apache.spark.sql.connector.expressions.Expression])
        : Option[Seq[String]] = {
      val values = children.collect { case l: V2Literal[_] => String.valueOf(l.value()) }
      if (values.length == children.length && values.nonEmpty) Some(values.toSeq)
      else None
    }
    def onSpatialDim(p: org.apache.spark.sql.connector.expressions.filter.Predicate): Boolean =
      p.children().headOption.exists(_.isInstanceOf[NamedReference]) &&
        p.children().head.asInstanceOf[NamedReference].fieldNames()
          .sameElements(Array("SpatialDim"))
    val accepted = predicates.toSeq.collect {
      case p if (p.name() == "IN" || p.name() == "=") && onSpatialDim(p) =>
        allStringValues(p.children().drop(1))
    }.flatten
    if (accepted.nonEmpty)
      runtimeSpatialDims = Some(accepted.flatten.toSet)
  }

  override def description(): String =
    s"graft-odata pushedSpatialDims=" +
      s"${pushedSpatialDims.map(_.mkString(",")).getOrElse("none")} limit=$limit" +
      s" select=${selectCols.getOrElse("all")}"

  private def opt(k: String, d: String) = options.getOrDefault(k, d)

  override def planInputPartitions(): Array[InputPartition] = {
    val indicators = opt("indicatorCodes", "").split(",").map(_.trim).filter(_.nonEmpty)
    val countries0 = opt("countryCodes", "").split(",").map(_.trim).filter(_.nonEmpty)
    // server-side filter: restrict the partition grid to the pushed
    // countries, then to the runtime (DPP) key set when one arrived
    val countries1 = pushedSpatialDims
      .map(cs => countries0.filter(cs.toSet)).getOrElse(countries0)
    val countries = runtimeSpatialDims
      .map(cs => countries1.filter(cs)).getOrElse(countries1)
    if (indicators.nonEmpty) {
      for (i <- indicators; c <- countries) yield
        ODataInputPartition(withSelect(entitySetFor(i, c)), s"${i}_$c"): InputPartition
    } else {
      Array(ODataInputPartition(withSelect(opt("entitySet", "Indicator")),
        "single"): InputPartition)
    }
  }

  private def entitySetFor(indicator: String, country: String): String = {
    val query = ODataClient.encodeObservationQuery(country)
    s"$indicator?$query"
  }

  /** Append the pushed `$select` to the entity-set query (encoded like the
    * other OData params; paging-param rewriting preserves it per page). */
  private def withSelect(entitySet: String): String = selectCols.fold(entitySet) { cols =>
    val sep = if (entitySet.contains("?")) "&" else "?"
    entitySet + sep +
      ODataClient.percentEncode("$select") + "=" + ODataClient.percentEncode(cols)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // runs driver-side: capture the session's Hadoop conf so executor-side
    // resume-file IO honors per-job FS settings (credentials, scheme impls)
    // instead of whatever `new Configuration()` finds on the executor classpath
    val resumeDir = Option(opt("resumeDir", "")).filter(_.nonEmpty)
    val hadoopConf = resumeDir.map { _ =>
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    }
    ODataReaderFactory(readSchema, opt("baseUrl", ""),
      opt("fetcherClass", classOf[HttpPageFetcherFactory].getName),
      opt("pageSize", "100").toInt, limit,
      opt("skipRequestErrors", "true").toBoolean,
      resumeDir, hadoopConf)
  }
}

final case class ODataInputPartition(entitySet: String, label: String) extends InputPartition

final case class ODataReaderFactory(schema: StructType, baseUrl: String,
                                    fetcherClass: String, pageSize: Int,
                                    limit: Option[Int],
                                    skipRequestErrors: Boolean = true,
                                    resumeDir: Option[String] = None,
                                    hadoopConf: Option[org.apache.spark.util.SerializableConfiguration] = None)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ODataInputPartition]
    def fetchAll(): Seq[Map[String, String]] = {
      val fetcher = Class.forName(fetcherClass)
        .getDeclaredConstructor().newInstance()
        .asInstanceOf[PageFetcherFactory].create()
      val client = new ODataClient(baseUrl, fetcher,
        skipRequestErrors = skipRequestErrors)
      // limit is per-partition here (a global limit needs a coordinated
      // CollectLimit above, which Spark adds anyway since pushLimit → false)
      client.getAllData(p.entitySet, s"dsv2_${p.label}", limit, pageSize)
    }
    val records = resumeDir match {
      case None => fetchAll()
      case Some(dir) =>
        ODataResume.loadOrFetch(dir, p.label, p.entitySet,
          hadoopConf.map(_.value))(fetchAll())
    }
    new PartitionReader[InternalRow] {
      private val it = records.iterator
      private var current: Map[String, String] = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow =
        InternalRow.fromSeq(schema.fieldNames.toSeq.map { f =>
          current.get(f).flatMap(Option(_)).map(UTF8String.fromString).orNull
        })
      override def close(): Unit = ()
    }
  }
}

/** Per-partition completion records for the parallel extraction path.
  *
  * A completion file holds the partition's full record list as JSON lines
  * and EXISTS only after an atomic tmp+rename — so its presence is the
  * commit marker (a crash mid-write leaves a `.tmp.*` orphan, never a
  * readable partial). Executors write it on successful fetch exhaustion;
  * a re-run's reader serves it instead of refetching. Task retries and
  * speculation are safe: records for a (label, query) pair are
  * deterministic server state, and a lost rename race just means the
  * winner's identical file is served.
  */
object ODataResume {

  private[odata] def completionPath(dir: String, label: String, entitySet: String): String = {
    val fp = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(entitySet).substring(0, 12)
    s"$dir/${label.replaceAll("[^A-Za-z0-9_.-]", "_")}_$fp.jsonl"
  }

  def loadOrFetch(dir: String, label: String, entitySet: String,
                  hadoopConf: Option[org.apache.hadoop.conf.Configuration] = None)
                 (fetch: => Seq[Map[String, String]]): Seq[Map[String, String]] = {
    // driver-captured session conf when the DSv2 scan plumbed one through;
    // default-classpath conf as the standalone fallback (file:// and plain HDFS)
    val conf = hadoopConf.getOrElse(new org.apache.hadoop.conf.Configuration())
    val path = new org.apache.hadoop.fs.Path(completionPath(dir, label, entitySet))
    val fs = path.getFileSystem(conf)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    if (fs.exists(path)) {
      val in = fs.open(path)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
                  finally in.close()
      lines.filter(_.nonEmpty).map { line =>
        val m = mapper.readValue(line, classOf[java.util.LinkedHashMap[String, String]])
        scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toMap
      }
    } else {
      val records = fetch
      val tmp = new org.apache.hadoop.fs.Path(
        path.toString + ".tmp." + java.util.UUID.randomUUID().toString.substring(0, 8))
      val parent = path.getParent
      if (parent != null && !fs.exists(parent)) fs.mkdirs(parent): Unit
      val out = fs.create(tmp, true)
      try records.foreach { r =>
        val jm = new java.util.LinkedHashMap[String, String]()
        r.foreach { case (k, v) => jm.put(k, v) }
        out.write((mapper.writeValueAsString(jm) + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } finally out.close()
      // first rename wins; a concurrent attempt (speculation) wrote the
      // same deterministic content, so losing the race is a no-op
      if (!fs.rename(tmp, path) && !fs.exists(path))
        throw new java.io.IOException(s"resume-record rename failed: $tmp -> $path")
      if (fs.exists(tmp)) fs.delete(tmp, false): Unit
      records
    }
  }
}
