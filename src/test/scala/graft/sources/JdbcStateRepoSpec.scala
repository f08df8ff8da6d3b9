package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** ST3: concurrent-writer conflict handling on the JDBC etl_state table
  * (reference etl/state.py:28-37), against embedded Derby. */
class JdbcStateRepoSpec extends AnyFunSuite with SparkSpec {

  test("concurrent writers on one process: races resolve, one intact value survives") {
    val url = s"jdbc:derby:${tempDir("derby-state")}/db;create=true"
    val repo = new JdbcStateRepo(url) // creates the table before the storm
    val threads = 8
    val iters = 25
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = (0 until threads).map { t =>
      new Thread(() => {
        try {
          val r = new JdbcStateRepo(url)
          (0 until iters).foreach { i =>
            r.setCheckpointState("proc", s"""{"t":$t,"i":$i}""")
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    pool.foreach(_.start())
    pool.foreach(_.join())
    assert(errors.isEmpty, s"writers failed: $errors")
    // exactly one row; its value is SOME thread's complete write, not a blend
    val st = repo.get("proc").get.checkpoint_state.get
    assert(st.matches("""\{"t":\d+,"i":\d+\}"""), st)
  }

  test("checkpoint and watermark columns update independently (no clobber)") {
    val url = s"jdbc:derby:${tempDir("derby-state2")}/db;create=true"
    val repo = new JdbcStateRepo(url)
    val runAt = java.sql.Timestamp.valueOf("2026-08-12 10:00:00")

    repo.setCheckpointState("p", """{"next_link":"http://api?skip=100"}""")
    repo.setLastSuccessfulRunAt("p", runAt)
    val row = repo.get("p").get
    assert(row.checkpoint_state === Some("""{"next_link":"http://api?skip=100"}"""))
    assert(row.last_successful_run_at === Some(runAt))

    // clearing the checkpoint (the reference's {} on completion) must not
    // touch the watermark
    repo.setCheckpointState("p", "{}")
    val cleared = repo.get("p").get
    assert(cleared.checkpoint_state === Some("{}"))
    assert(cleared.last_successful_run_at === Some(runAt))
  }

  test("Checkpointable seam: ODataClient resumes from a JDBC-stored checkpoint") {
    val url = s"jdbc:derby:${tempDir("derby-state3")}/db;create=true"
    val repo = new JdbcStateRepo(url)
    assert(repo.get("absent") === None)
    repo.setCheckpointState("odata_proc", """{"next_link":"http://t/api/X?%24top=2&%24skip=2"}""")
    assert((repo: Checkpointable).getCheckpointJson("odata_proc")
      .exists(_.contains("skip=2")))
  }
}
