package graft.who

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** WHO transform stage — set-oriented re-expression of reference
  * etl/transform.py. Semantics preserved exactly:
  *
  *  - missing expected columns are added as NULLs (P1, transform.py:30-32);
  *  - `NumericValue` coerces with pandas `errors='coerce'` semantics —
  *    `try_cast`, never `cast`, because Spark 4 ANSI mode throws (P3);
  *  - year strings like "2020-2020" normalize to 2020 (P4, transform.py:38-39;
  *    split-first-then-try_cast exactly mirrors `.str.split('-').str[0]` +
  *    `to_numeric(errors='coerce')`);
  *  - rows with a NULL key (IndicatorCode/SpatialDim/TimeDim) drop *after*
  *    coercion, so an unparseable year drops the row (P5, transform.py:42);
  *  - dedup keeps the first occurrence in ingest order: pandas
  *    `drop_duplicates` is first-wins, Spark `dropDuplicates` is arbitrary,
  *    so every transform threads an explicit ingest-order column through a
  *    window (D1-D3, transform.py:45-48,67,78).
  *
  * All logic is built-in Column expressions — whole-stage codegen throughout,
  * no UDFs — so the stage runs at scan speed regardless of scale.
  */
object Transform {

  private[graft] val IngestOrder = "__ingest_order"

  /** Observation columns the reference force-creates (transform.py:30-32).
    * The reference omits NumericValue from the list and would crash on a
    * batch lacking it; we include it to make the transform total. */
  private val expectedObsCols = Seq(
    "Id", "IndicatorCode", "SpatialDim", "SpatialDimType",
    "TimeDim", "TimeDimType", "NumericValue", "Value")

  private val indicatorCols = Seq("IndicatorCode", "IndicatorName", "Language")
  private val countryCols = Seq("Code", "Title")

  /** P1: add missing expected columns as NULL strings. */
  def ensureColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string")))

  /** Attach the ingest-order tiebreaker: (source file path, per-partition
    * monotonic id), compared lexicographically. Spark packs FILE-scan
    * partitions by SIZE (largest first), not file order, so the
    * partition-index component of `monotonically_increasing_id` alone does
    * NOT reproduce ingest order across a multi-file staged read; the file
    * path (part-00000, part-00001, … for staged writes — name order IS
    * write order) restores it, and within a file/split rows stream in file
    * order. For non-file sources `input_file_name()` is empty and the
    * monotonic id alone orders (in-memory batches are single-partition; the
    * DSv2 scan's partition index follows the (indicator, country) grid). */
  def withIngestOrder(df: DataFrame): DataFrame =
    if (df.columns.contains(IngestOrder)) df
    else df.withColumn(IngestOrder,
      // length precedes the path: part file numbering grows digits past
      // part-99999, and plain lexicographic order would put part-100000
      // before part-20000
      struct(length(input_file_name()).as("src_len"),
        input_file_name().as("src_file"),
        monotonically_increasing_id().as("row_seq")))

  /** reference transform_observations (etl/transform.py:10-51). Extra
    * (unexpected) columns survive — the reference never projects observations
    * down; validation later keeps only the model fields. */
  def transformObservations(raw: DataFrame): DataFrame = {
    val ensured = ensureColumns(withIngestOrder(raw), expectedObsCols)
    val coerced = ensured
      .withColumn("NumericValue", expr("try_cast(NumericValue AS DOUBLE)"))
      .withColumn("TimeDim",
        expr("try_cast(element_at(split(cast(TimeDim AS STRING), '-'), 1) AS INT)"))
    val keyed = coerced.filter(
      col("IndicatorCode").isNotNull && col("SpatialDim").isNotNull &&
        col("TimeDim").isNotNull)
    Dedup.byIdOrComposite(keyed, "Id",
      Seq("IndicatorCode", "SpatialDim", "TimeDim"),
      Seq(col(IngestOrder).asc))
  }

  /** reference transform_indicators (etl/transform.py:53-69): ensure columns,
    * project down to exactly the model columns, dedup by code. */
  def transformIndicators(raw: DataFrame): DataFrame = {
    val ensured = ensureColumns(withIngestOrder(raw), indicatorCols)
    Dedup.firstWins(ensured, Seq("IndicatorCode"), Seq(col(IngestOrder).asc))
      .select((indicatorCols :+ IngestOrder).map(col): _*)
  }

  /** reference transform_countries (etl/transform.py:71-80): dedup by Code;
    * extra columns survive (the reference never projects countries). */
  def transformCountries(raw: DataFrame): DataFrame = {
    val ensured = ensureColumns(withIngestOrder(raw), countryCols)
    Dedup.firstWins(ensured, Seq("Code"), Seq(col(IngestOrder).asc))
  }

  /** Drop the internal ingest-order column before handing rows to a sink. */
  def dropIngestOrder(df: DataFrame): DataFrame =
    if (df.columns.contains(IngestOrder)) df.drop(IngestOrder) else df
}
