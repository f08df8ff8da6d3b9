package graft.sources

import java.sql.{Connection, DriverManager, SQLException, Timestamp}
import java.util.Properties

import graft.who.Schemas.EtlStateRow

/** JDBC-backed ETL-state repository — the reference's `etl_state` table on
  * its actual storage (a transactional database; reference etl/models.py:
  * 37-42, etl/state.py:13-66), including the CONCURRENT-WRITER conflict
  * handling the parquet [[StateRepo]] declares a single-writer non-goal
  * (SURVEY.md ST3):
  *
  *  - each set is the reference's IntegrityError dance (etl/state.py:28-37):
  *    try INSERT; a duplicate-key violation means another writer created the
  *    row concurrently → rollback and UPDATE the existing row instead;
  *  - transient serialization failures / lock timeouts under contention
  *    retry with backoff (the database arbitrates; last committer wins —
  *    exactly the semantics of the reference's session retry);
  *  - `setCheckpointState` / `setLastSuccessfulRunAt` each touch ONLY their
  *    column in the UPDATE path, so concurrent writers of the two fields
  *    never clobber each other (stronger than read-modify-write).
  *
  * State is one row per process — driver-side JDBC, no Spark job. Both repos
  * implement [[Checkpointable]], so the extraction layer is storage-agnostic. */
class JdbcStateRepo(url: String, props: Properties = new Properties(),
                    table: String = "etl_state", maxAttempts: Int = 5,
                    sleeper: Long => Unit = Thread.sleep) extends Checkpointable {

  ensureTable()

  override def getCheckpointJson(processName: String): Option[String] =
    get(processName).flatMap(_.checkpoint_state)

  override def setCheckpointState(processName: String, checkpointJson: String): Unit =
    set(processName, "checkpoint_state",
      (ps, i) => ps.setString(i, checkpointJson),
      insertRow = EtlStateRow(processName, None, Some(checkpointJson)))

  def setLastSuccessfulRunAt(processName: String, runAt: Timestamp): Unit =
    set(processName, "last_successful_run_at",
      (ps, i) => ps.setTimestamp(i, runAt),
      insertRow = EtlStateRow(processName, Some(runAt), None))

  def get(processName: String): Option[EtlStateRow] = withConn { conn =>
    val ps = conn.prepareStatement(
      s"""SELECT process_name, last_successful_run_at, checkpoint_state
         |FROM $table WHERE process_name = ?""".stripMargin)
    try {
      ps.setString(1, processName)
      val rs = ps.executeQuery()
      try {
        if (!rs.next()) None
        else Some(EtlStateRow(rs.getString(1),
          Option(rs.getTimestamp(2)), Option(rs.getString(3))))
      } finally rs.close()
    } finally ps.close()
  }

  /** INSERT-first upsert of one column (reference state.py:28-37), retried
    * through duplicate-key races and transient lock conflicts. */
  private def set(processName: String, column: String,
                  bind: (java.sql.PreparedStatement, Int) => Unit,
                  insertRow: EtlStateRow): Unit = {
    var attempt = 0
    var lastError: SQLException = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        return withConn { conn =>
          conn.setAutoCommit(false)
          try {
            try {
              val ins = conn.prepareStatement(
                s"""INSERT INTO $table (process_name, last_successful_run_at, checkpoint_state)
                   |VALUES (?, ?, ?)""".stripMargin)
              try {
                ins.setString(1, insertRow.process_name)
                ins.setTimestamp(2, insertRow.last_successful_run_at.orNull)
                ins.setString(3, insertRow.checkpoint_state.orNull)
                ins.executeUpdate(): Unit
              } finally ins.close()
            } catch {
              case e: SQLException if isDuplicateKey(e) =>
                // another writer inserted concurrently: rollback, update
                // only OUR column of the now-existing row
                conn.rollback()
                val upd = conn.prepareStatement(
                  s"UPDATE $table SET $column = ? WHERE process_name = ?")
                try {
                  bind(upd, 1)
                  upd.setString(2, processName)
                  upd.executeUpdate(): Unit
                } finally upd.close()
            }
            conn.commit()
          } catch {
            case e: Throwable =>
              try conn.rollback() catch { case _: Throwable => () }
              throw e
          }
        }
      } catch {
        case e: SQLException if isTransient(e) && attempt < maxAttempts =>
          lastError = e
          sleeper(50L * attempt)
      }
    }
    throw lastError
  }

  /** SQLState 23xxx = integrity constraint violation (duplicate key). */
  private def isDuplicateKey(e: SQLException): Boolean =
    Option(e.getSQLState).exists(_.startsWith("23"))

  /** Lock timeout / deadlock / serialization failure SQLState classes
    * (40xxx, plus Derby's 40XL1/40001 forms) — safe to retry. */
  private def isTransient(e: SQLException): Boolean =
    Option(e.getSQLState).exists(s => s.startsWith("40") || s.startsWith("23"))

  private def ensureTable(): Unit = withConn { conn =>
    val st = conn.createStatement()
    try st.execute(
      s"""CREATE TABLE $table (
         |  process_name VARCHAR(256) PRIMARY KEY,
         |  last_successful_run_at TIMESTAMP,
         |  checkpoint_state VARCHAR(8000)
         |)""".stripMargin): Unit
    catch {
      // no portable IF NOT EXISTS: swallow only "table already exists"
      // (Derby X0Y32, Postgres 42P07)
      case e: SQLException
        if Option(e.getSQLState).exists(s => s == "X0Y32" || s == "42P07") => ()
    } finally st.close()
  }

  private def withConn[T](f: Connection => T): T = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }
}
