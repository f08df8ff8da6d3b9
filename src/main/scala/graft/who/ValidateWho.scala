package graft.who

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Validate
import graft.operators.Validate.Rule
import Schemas._

/** Typed validation for the three WHO entities — the Spark re-expression of
  * `validate_dataframe(df, model)` (reference etl/validate.py:51-67).
  *
  * The reference validates row-by-row against Pydantic models; here each
  * model becomes (a) a set of vectorized rules evaluated in one pass and
  * (b) an aliased projection to the typed Dataset. Failures land on the
  * dead-letter side with the raw row serialized as JSON plus per-field error
  * messages (reference RejectedRecord, etl/validate.py:39-49) — superset of
  * the reference, which only persists rejects on the local_run path
  * (SURVEY.md gotcha #5).
  */
object ValidateWho {

  /** Observation model (reference etl/validate.py:18-37): 6 required fields,
    * numeric_value/value optional; observation_id resolved to Long
    * (SURVEY.md gotcha #7) with non-numeric ids rejected. Expects the
    * transformed frame (TimeDim already int, NumericValue double). */
  def validateObservations(df: DataFrame): (Dataset[Observation], DataFrame) = {
    val prepared = df.withColumn("__obs_id", expr("try_cast(Id AS BIGINT)"))
    val rules = Seq(
      Rule("observation_id is required", col("Id").isNotNull),
      Rule("observation_id must be numeric",
        col("Id").isNull || col("__obs_id").isNotNull),
      Rule("indicator_code is required", col("IndicatorCode").isNotNull),
      Rule("spatial_dim is required", col("SpatialDim").isNotNull),
      Rule("spatial_dim_type is required", col("SpatialDimType").isNotNull),
      Rule("time_dim is required", col("TimeDim").isNotNull),
      Rule("time_dim_type is required", col("TimeDimType").isNotNull))
    val (valid, rejected) = Validate.split(prepared, rules)
    val typed = valid.select(
      col("__obs_id").as("observation_id"),
      col("IndicatorCode").as("indicator_code"),
      col("SpatialDim").as("spatial_dim"),
      col("SpatialDimType").as("spatial_dim_type"),
      col("TimeDim").cast("int").as("time_dim"),
      col("TimeDimType").as("time_dim_type"),
      col("NumericValue").cast("double").as("numeric_value"),
      col("Value").cast("string").as("value")
    ).as(Encoders.product[Observation])
    (typed, toRejected(rejected))
  }

  /** Indicator model (reference etl/validate.py:6-12): all three required. */
  def validateIndicators(df: DataFrame): (Dataset[Indicator], DataFrame) = {
    val rules = Seq(
      Rule("indicator_code is required", col("IndicatorCode").isNotNull),
      Rule("indicator_name is required", col("IndicatorName").isNotNull),
      Rule("language is required", col("Language").isNotNull))
    val (valid, rejected) = Validate.split(df, rules)
    val typed = valid.select(
      col("IndicatorCode").as("indicator_code"),
      col("IndicatorName").as("indicator_name"),
      col("Language").as("language")
    ).as(Encoders.product[Indicator])
    (typed, toRejected(rejected))
  }

  /** Country model (reference etl/validate.py:13-17): both required. */
  def validateCountries(df: DataFrame): (Dataset[Country], DataFrame) = {
    val rules = Seq(
      Rule("country_code is required", col("Code").isNotNull),
      Rule("country_name is required", col("Title").isNotNull))
    val (valid, rejected) = Validate.split(df, rules)
    val typed = valid.select(
      col("Code").as("country_code"),
      col("Title").as("country_name")
    ).as(Encoders.product[Country])
    (typed, toRejected(rejected))
  }

  private def toRejected(rejected: DataFrame): DataFrame = {
    val payload = rejected.drop("error_details")
    rejected.select(
      to_json(struct(payload.columns.filterNot(_.startsWith("__")).map(col): _*))
        .as("record_data"),
      col("error_details"))
  }
}
