package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import graft.operators.Upsert
import graft.who.Schemas.EtlStateRow
import org.apache.spark.sql.functions.col

/** Keyed ETL-state table — the reference's `etl_state`
  * (process_name PK, last_successful_run_at, checkpoint_state JSON;
  * reference etl/models.py:37-42 + etl/state.py:13-66).
  *
  * Kept as an explicitly queryable parquet table rather than an opaque
  * streaming checkpoint dir, for fidelity: the reference treats state as
  * relational data. Reads/writes go through the generic keyed-upsert
  * operator, so each `set` is a read-modify-write upsert keyed by
  * process_name — idempotent, last-writer-wins, matching the reference's
  * ON CONFLICT behavior. State is tiny (one row per process), so the
  * driver-side collect in `get` is deliberate, not a scale hazard.
  *
  * The reference's IntegrityError dance (state.py:28-37) handles concurrent
  * writers; our design is single-writer-per-process (SURVEY.md ST3), and the
  * upsert is idempotent anyway.
  */
class StateRepo(spark: SparkSession, path: String) extends Checkpointable {

  override def getCheckpointJson(processName: String): Option[String] =
    get(processName).flatMap(_.checkpoint_state)

  private val enc = Encoders.product[EtlStateRow]

  def all(): DataFrame =
    if (graft.util.Fs.exists(path, spark.sparkContext.hadoopConfiguration))
      spark.read.parquet(path)
    else spark.createDataset(Seq.empty[EtlStateRow])(enc).toDF()

  /** reference EtlStateRepository.get_state (etl/state.py:17-19). */
  def get(processName: String): Option[EtlStateRow] =
    all().filter(col("process_name") === processName)
      .as(enc).collect().headOption

  /** reference set_checkpoint_state (etl/state.py:21-37): stores the JSON
    * checkpoint blob; `{}` means cleared. */
  override def setCheckpointState(processName: String, checkpointJson: String): Unit = {
    val prev = get(processName)
    put(EtlStateRow(processName,
      prev.flatMap(_.last_successful_run_at), Some(checkpointJson)))
  }

  /** reference set_last_successful_run_at (etl/state.py:39-55) — the
    * watermark API (defined but never wired in the reference DAG; SURVEY.md
    * ST2 — implemented here as a first-class call). */
  def setLastSuccessfulRunAt(processName: String, runAt: java.sql.Timestamp): Unit = {
    val prev = get(processName)
    put(EtlStateRow(processName, Some(runAt),
      prev.flatMap(_.checkpoint_state)))
  }

  private def put(row: EtlStateRow): Unit = {
    val updates = spark.createDataset(Seq(row))(enc).toDF()
    Upsert.upsertTable(spark, path, updates,
      Seq("process_name"), Seq(col("process_name")))
  }
}
