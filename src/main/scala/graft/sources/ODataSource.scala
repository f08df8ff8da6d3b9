package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** Transport abstraction under the OData client — the seam that makes the
  * zero-egress test environment workable: tests plug a deterministic stub,
  * production plugs [[HttpPageFetcher]]. Mirrors the reference's httpx usage
  * (reference etl/extract.py:35-38). */
trait PageFetcher {
  /** GET `url` → (statusCode, body). Transport-level failures (DNS, refused
    * connection, timeout) throw [[TransportException]]. */
  def fetch(url: String): (Int, String)
}

final class TransportException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

final class HttpStatusException(val status: Int, msg: String)
  extends RuntimeException(msg)

/** Checkpoint seam — the reference's `Checkpointable` Protocol
  * (etl/extract.py:11-13). [[StateRepo]] is the durable implementation;
  * tests use an in-memory one. */
trait Checkpointable {
  def getCheckpointJson(processName: String): Option[String]
  def setCheckpointState(processName: String, checkpointJson: String): Unit
}

/** Paged, resumable OData extraction — reference `ODataClient`
  * (etl/extract.py:15-117) re-expressed in Scala. Semantics preserved:
  *
  *  - `$top`/`$skip` offset paging; stop when a page is shorter than `$top`
  *    (extract.py:75-79);
  *  - resume: the starting URL is the saved `next_link` checkpoint when
  *    present (extract.py:90-102); a checkpoint is written after each full
  *    page and cleared (`{}`) on completion (extract.py:80-87);
  *  - retry: 3 attempts with exponential backoff 4–10 s (extract.py:30);
  *  - 404 → empty page, never an error (extract.py:41-43);
  *  - transport error with `skipRequestErrors` → empty page, no retry;
  *    without → retried then propagated (extract.py:46-50);
  *  - `limit` is approximate: checked per page, may overshoot within a page
  *    (extract.py:70-73).
  *
  * Extraction is driver-side by design, exactly as the reference's generator
  * is: pages are metadata-scale. The scale path is [[ODataClient.fetchObservations]]'s
  * (indicator × country) partitioning — each pair is an independent resumable
  * process, which on a cluster fans out as one task per pair (the reference
  * runs them sequentially; SURVEY.md §4 "partitioned fetch").
  */
class ODataClient(
    val baseUrl: String,
    fetcher: PageFetcher,
    stateRepo: Option[Checkpointable] = None,
    skipRequestErrors: Boolean = true,
    maxAttempts: Int = 3,
    sleeper: Long => Unit = Thread.sleep) {

  private val mapper = new ObjectMapper()

  /** One page with retry — reference `_get_page` + tenacity (extract.py:30-50). */
  private[sources] def getPage(url: String): Seq[Map[String, String]] = {
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        return requestPage(url)
      } catch {
        case e: Throwable =>
          lastError = e
          if (attempt < maxAttempts)
            sleeper(math.min(10000L, 4000L * (1L << (attempt - 1))))
      }
    }
    throw lastError
  }

  private def requestPage(url: String): Seq[Map[String, String]] = {
    val (status, body) =
      try fetcher.fetch(url)
      catch {
        case e: TransportException =>
          if (skipRequestErrors) return Seq.empty // skip → empty page, no retry
          else throw e // retried by getPage, then propagated
      }
    if (status == 404) Seq.empty // 404 → empty page, never a failure
    else if (status >= 400) throw new HttpStatusException(status, s"HTTP $status for $url")
    else parseRecords(body)
  }

  private def parseRecords(body: String): Seq[Map[String, String]] = {
    val root = mapper.readTree(body)
    val value = root.get("value")
    if (value == null || !value.isArray) Seq.empty
    else value.elements().asScala.map { rec =>
      rec.properties().asScala.map { e =>
        e.getKey -> jsonScalarToString(e.getValue)
      }.toMap
    }.toSeq
  }

  /** Number→string coercion at the ingest boundary (the Pydantic
    * `coerce_numbers_to_str` analog, reference etl/validate.py:8). */
  private def jsonScalarToString(n: JsonNode): String =
    if (n == null || n.isNull) null
    else if (n.isTextual) n.asText()
    else if (n.isValueNode) n.asText()
    else n.toString // nested object/array kept as compact JSON

  /** reference `get_all_data` (extract.py:52-87). */
  def getAllData(entitySet: String, processName: String,
                 limit: Option[Int] = None, pageSize: Int = 100): Seq[Map[String, String]] = {
    var nextLink: Option[String] = Some(initialUrl(entitySet, processName, pageSize))
    val out = Vector.newBuilder[Map[String, String]]
    var fetched = 0
    while (nextLink.isDefined) {
      val url = nextLink.get
      val records = getPage(url)
      out ++= records
      fetched += records.size
      if (limit.exists(fetched >= _)) {
        nextLink = None
      } else {
        val (top, skip) = pagingParams(url, pageSize)
        nextLink =
          if (records.size < top) None
          else Some(setPagingParams(url, top, skip + top))
        nextLink.foreach { link =>
          stateRepo.foreach(_.setCheckpointState(processName,
            mapper.writeValueAsString(Map("next_link" -> link).asJava)))
        }
      }
    }
    // Clear checkpoint on successful completion (extract.py:85-87).
    stateRepo.foreach(_.setCheckpointState(processName, "{}"))
    out.result()
  }

  /** reference `_get_initial_url` (extract.py:90-102). */
  private[sources] def initialUrl(entitySet: String, processName: String,
                                  pageSize: Int): String = {
    val resumed = for {
      repo <- stateRepo
      json <- repo.getCheckpointJson(processName)
      node = mapper.readTree(json)
      link <- Option(node.get("next_link")).filter(_.isTextual).map(_.asText())
    } yield link
    resumed.getOrElse(setPagingParams(s"$baseUrl/$entitySet", pageSize, 0))
  }

  /** reference `_get_paging_params` (extract.py:104-109). Accepts both the
    * plain `$top` form we write and the `%24top` form Python's urlencode
    * produces (visible in reference tests/test_extract.py:38-40), so resume
    * works across either checkpoint format. */
  private[sources] def pagingParams(url: String, defaultTop: Int): (Int, Int) = {
    val params = splitUrl(url)._2.map { case (k, v) => decodeKey(k) -> v }.toMap
    (params.get("$top").map(_.toInt).getOrElse(defaultTop),
      params.get("$skip").map(_.toInt).getOrElse(0))
  }

  private def decodeKey(k: String): String = k.replace("%24", "$")

  /** reference `_set_paging_params` (extract.py:111-117): replace in place
    * preserving the order of other query params, append when absent. */
  private[sources] def setPagingParams(url: String, top: Int, skip: Int): String = {
    val (base, params) = splitUrl(url)
    val others = params.filterNot(p => decodeKey(p._1) == "$top" || decodeKey(p._1) == "$skip")
    val updated = others ++ Seq("$top" -> top.toString, "$skip" -> skip.toString)
    base + "?" + updated.map { case (k, v) => s"$k=$v" }.mkString("&")
  }

  private def splitUrl(url: String): (String, Seq[(String, String)]) = {
    val i = url.indexOf('?')
    if (i < 0) (url, Nil)
    else {
      val params = url.substring(i + 1).split("&").toSeq.filter(_.nonEmpty).map { kv =>
        val j = kv.indexOf('=')
        if (j < 0) (kv, "") else (kv.substring(0, j), kv.substring(j + 1))
      }
      (url.substring(0, i), params)
    }
  }
}

object ODataClient {

  /** Python `urllib.parse.quote(safe='')` equivalent, for OData `$filter`
    * values (reference etl/extract.py:137-143). */
  private[sources] def percentEncode(s: String): String =
    s.flatMap {
      case c if c.isLetterOrDigit && c < 128 => c.toString
      case c @ ('_' | '.' | '~' | '-') => c.toString
      case c => c.toString.getBytes("UTF-8").map(b => f"%%${b & 0xff}%02X").mkString
    }

  /** The per-(indicator,country) observation query string with pushed
    * filter + order (reference etl/extract.py:137-143), encoded like
    * Python's `urlencode(quote_via=quote)`. */
  def encodeObservationQuery(country: String): String =
    percentEncode("$filter") + "=" +
      percentEncode(s"SpatialDim eq '$country'") + "&" +
      percentEncode("$orderby") + "=" + percentEncode("TimeDim asc")

  /** reference `fetch_observations` (extract.py:119-153): per
    * (indicator, country) scan with server-side filter + order pushdown and
    * nested early-exit on the global limit. */
  def fetchObservations(client: ODataClient, indicatorCodes: Seq[String],
                        countryCodes: Seq[String],
                        limit: Option[Int] = None,
                        pageSize: Int = 100): Seq[Map[String, String]] = {
    val out = Vector.newBuilder[Map[String, String]]
    var fetched = 0
    val indIt = indicatorCodes.iterator
    while (indIt.hasNext && !limit.exists(fetched >= _)) {
      val indicator = indIt.next()
      val ctyIt = countryCodes.iterator
      while (ctyIt.hasNext && !limit.exists(fetched >= _)) {
        val country = ctyIt.next()
        val entitySet = s"$indicator?${encodeObservationQuery(country)}"
        val processName = s"who_observations_${indicator}_$country"
        val remaining = limit.map(_ - fetched)
        val batch = client.getAllData(entitySet, processName, remaining, pageSize)
        out ++= batch
        fetched += batch.size
      }
    }
    out.result()
  }

  /** Stage driver-fetched records as a permissive-schema DataFrame: declared
    * columns first (absent → NULL, the ensure-columns behavior), unexpected
    * keys appended as extra string columns (observations keep extras —
    * SURVEY.md gotcha in §4). Single partition to preserve ingest order for
    * first-wins dedup; batches here are driver-memory-scale by construction. */
  def toDataFrame(spark: SparkSession, records: Seq[Map[String, String]],
                  baseSchema: StructType): DataFrame = {
    val extra = records.flatMap(_.keys).distinct.filterNot(baseSchema.fieldNames.contains)
    val schema = StructType(baseSchema.fields ++ extra.map(StructField(_, StringType, nullable = true)))
    val rows: java.util.List[Row] =
      records.map(r => Row.fromSeq(schema.fieldNames.toSeq.map(n => r.getOrElse(n, null)))).asJava
    spark.createDataFrame(rows, schema).coalesce(1)
  }
}

/** Production transport over java.net.http — 30 s timeout, redirects
  * followed, like the reference client (etl/extract.py:22,36). Unused in the
  * zero-egress test environment; exercised only via the [[PageFetcher]] seam. */
class HttpPageFetcher(timeoutSeconds: Long = 30) extends PageFetcher {
  private lazy val client = java.net.http.HttpClient.newBuilder()
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
    .build()

  override def fetch(url: String): (Int, String) = {
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds)).GET().build()
    try {
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    } catch {
      case e: java.io.IOException => throw new TransportException(s"request failed: $url", e)
      case e: InterruptedException => throw new TransportException(s"interrupted: $url", e)
    }
  }
}
