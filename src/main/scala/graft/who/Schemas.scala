package graft.who

import org.apache.spark.sql.types._

/** Schemas and typed records for the WHO GHO pipeline.
  *
  * Raw ingest schemas are permissive all-nullable-string StructTypes —
  * faithful to the reference's schema-on-read ingest (pd.DataFrame over API
  * dicts, reference etl/transform.py:15): an explicit schema yields NULL for
  * absent fields, reproducing the ensure-columns behavior, and string-typed
  * fields absorb the API's number→string coercion (Pydantic
  * `coerce_numbers_to_str`, reference etl/validate.py:8).
  *
  * Typed records mirror the Pydantic models (reference etl/validate.py:6-37)
  * with snake_case names from the field aliases. `observation_id` is Long
  * here: the reference declares Integer DDL but str model (etl/models.py:27
  * vs etl/validate.py:23) and lets the DB driver coerce — we resolve the
  * conflict to LongType and route non-numeric ids to the dead letter.
  */
object Schemas {

  private def allString(names: Seq[String]): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  val rawObservation: StructType = allString(Seq(
    "Id", "IndicatorCode", "SpatialDim", "SpatialDimType",
    "TimeDim", "TimeDimType", "NumericValue", "Value"))

  val rawIndicator: StructType = allString(Seq(
    "IndicatorCode", "IndicatorName", "Language"))

  val rawCountry: StructType = allString(Seq("Code", "Title"))

  final case class Indicator(
      indicator_code: String,
      indicator_name: String,
      language: String)

  final case class Country(
      country_code: String,
      country_name: String)

  final case class Observation(
      observation_id: Long,
      indicator_code: String,
      spatial_dim: String,
      spatial_dim_type: String,
      time_dim: Int,
      time_dim_type: String,
      numeric_value: Option[Double],
      value: Option[String])

  /** reference etl/models.py:37-42 */
  final case class EtlStateRow(
      process_name: String,
      last_successful_run_at: Option[java.sql.Timestamp],
      checkpoint_state: Option[String])

  /** reference etl/models.py:45-50 (autoinc id dropped: parquet has no
    * sequence; record_data is JSON, not a Python repr — documented
    * divergence). */
  final case class RejectedRecord(record_data: String, error_details: String)
}
