package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Ports of reference tests/test_extract.py:10-71 plus the error-mode matrix
  * (404 / transport skip / transport raise) from etl/extract.py:30-50. */
class ODataSourceSpec extends AnyFunSuite {

  private class MemoryState extends Checkpointable {
    val log = mutable.ArrayBuffer.empty[(String, String)]
    val state = mutable.Map.empty[String, String]
    override def getCheckpointJson(p: String): Option[String] = state.get(p)
    override def setCheckpointState(p: String, json: String): Unit = {
      log += (p -> json); state(p) = json
    }
  }

  private class ScriptedFetcher(responses: Seq[(Int, String)]) extends PageFetcher {
    val urls = mutable.ArrayBuffer.empty[String]
    private var i = -1
    override def fetch(url: String): (Int, String) = {
      urls += url
      i += 1
      responses(math.min(i, responses.size - 1))
    }
  }

  private def page(ids: Int*) =
    (200, s"""{"value": [${ids.map(i => s"""{"id": $i}""").mkString(", ")}]}""")

  test("pagination: three pages, checkpoint written mid-run and cleared at end") {
    val state = new MemoryState
    val fetcher = new ScriptedFetcher(Seq(page(1, 2), page(3, 4), page()))
    val client = new ODataClient("http://test.com/api", fetcher, Some(state))

    val all = client.getAllData("entity", "test_process", pageSize = 2)

    assert(all.size === 4)
    assert(all.head("id") === "1")
    assert(all(3)("id") === "4")
    assert(fetcher.urls.toSeq === Seq(
      "http://test.com/api/entity?$top=2&$skip=0",
      "http://test.com/api/entity?$top=2&$skip=2",
      "http://test.com/api/entity?$top=2&$skip=4"))
    // checkpoint carries the NEXT link after each full page…
    assert(state.log.contains("test_process" ->
      """{"next_link":"http://test.com/api/entity?$top=2&$skip=2"}"""))
    // …and is cleared on completion
    assert(state.log.last === ("test_process" -> "{}"))
  }

  test("resume: saved next_link consumed, exactly one request issued") {
    val state = new MemoryState
    // the Python-urlencoded form, as the reference writes it
    state.state("test_process") =
      """{"next_link": "http://test.com/api/entity?$top=2&$skip=2"}"""
    val fetcher = new ScriptedFetcher(Seq(page(3)))
    val client = new ODataClient("http://test.com/api", fetcher, Some(state))

    val all = client.getAllData("entity", "test_process", pageSize = 2)

    assert(all.size === 1)
    assert(all.head("id") === "3")
    assert(fetcher.urls.toSeq === Seq("http://test.com/api/entity?$top=2&$skip=2"))
  }

  test("resume accepts %24-encoded paging params in a saved link") {
    val state = new MemoryState
    state.state("p") = """{"next_link": "http://t/e?%24top=2&%24skip=4"}"""
    val fetcher = new ScriptedFetcher(Seq(page(9)))
    val client = new ODataClient("http://t", fetcher, Some(state))
    val all = client.getAllData("e", "p", pageSize = 2)
    assert(all.size === 1)
    // short page (1 < top=2) → stop; no further requests
    assert(fetcher.urls.size === 1)
  }

  test("404 yields an empty page, not a failure") {
    val client = new ODataClient("http://t",
      new ScriptedFetcher(Seq((404, "not found"))), None)
    assert(client.getAllData("e", "p", pageSize = 2).isEmpty)
  }

  test("transport error with skipRequestErrors yields empty page, no retry") {
    var calls = 0
    val fetcher = new PageFetcher {
      override def fetch(url: String): (Int, String) = {
        calls += 1; throw new TransportException("connection refused")
      }
    }
    val client = new ODataClient("http://t", fetcher, None, skipRequestErrors = true)
    assert(client.getAllData("e", "p", pageSize = 2).isEmpty)
    assert(calls === 1)
  }

  test("transport error without skip is retried 3x then propagated") {
    var calls = 0
    val fetcher = new PageFetcher {
      override def fetch(url: String): (Int, String) = {
        calls += 1; throw new TransportException("connection refused")
      }
    }
    val client = new ODataClient("http://t", fetcher, None,
      skipRequestErrors = false, sleeper = _ => ())
    intercept[TransportException] {
      client.getAllData("e", "p", pageSize = 2)
    }
    assert(calls === 3)
  }

  test("HTTP 500 is retried then propagated; limit stops paging early") {
    var calls = 0
    val fetcher = new PageFetcher {
      override def fetch(url: String): (Int, String) = { calls += 1; (500, "boom") }
    }
    val client = new ODataClient("http://t", fetcher, None, sleeper = _ => ())
    intercept[HttpStatusException] { client.getAllData("e", "p", pageSize = 2) }
    assert(calls === 3)

    // limit: stop after first page even though it was full
    val f2 = new ScriptedFetcher(Seq(page(1, 2), page(3, 4)))
    val c2 = new ODataClient("http://t", f2, None)
    val limited = c2.getAllData("e", "p", limit = Some(2), pageSize = 2)
    assert(limited.size === 2)
    assert(f2.urls.size === 1)
  }

  test("fetchObservations: per (indicator,country) scans with pushed filter") {
    val state = new MemoryState
    val fetcher = new PageFetcher {
      val urls = mutable.ArrayBuffer.empty[String]
      override def fetch(url: String): (Int, String) = {
        urls += url
        if (url.contains("%27USA%27")) page(1) else page(2)
      }
    }
    val client = new ODataClient("http://t", fetcher, Some(state))
    val out = ODataClient.fetchObservations(client,
      Seq("IND_A"), Seq("USA", "CAN"), limit = None, pageSize = 10)
    assert(out.size === 2)
    assert(fetcher.urls.exists(u =>
      u.contains("IND_A?%24filter=SpatialDim%20eq%20%27USA%27") &&
        u.contains("%24orderby=TimeDim%20asc")))
    // each pair is its own resumable process
    assert(state.state.keySet === Set(
      "who_observations_IND_A_USA", "who_observations_IND_A_CAN"))
  }
}
