package graft.who

/** Environment-driven configuration — reference `etl/config.py:23-43`
  * semantics: permissive boolean parsing (lowercase+trim membership test),
  * comma-split indicator lists with empty entries dropped, integer
  * fallbacks. */
object Config {

  /** reference config.py:34: `str(v).strip().lower() in ("1","true","yes","y")`. */
  def parseBool(v: String, default: Boolean = false): Boolean =
    Option(v).map(_.trim.toLowerCase)
      .map(s => Set("1", "true", "yes", "y").contains(s))
      .getOrElse(default)

  /** reference config.py:40: comma split, trimmed, empties dropped. */
  def parseList(v: String): Seq[String] =
    Option(v).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)

  def parseInt(v: String, default: Int): Int =
    Option(v).flatMap(_.trim.toIntOption).getOrElse(default)

  /** Assemble a [[PipelineConfig]] from an environment map (Airflow-Variable
    * analog; reference config.py + dag params). */
  def fromEnv(env: Map[String, String], warehouseDir: String, stateDir: String): PipelineConfig =
    PipelineConfig(
      baseUrl = env.getOrElse("WHO_API_BASE_URL", "https://ghoapi.azureedge.net/api"),
      warehouseDir = warehouseDir,
      stateDir = stateDir,
      indicatorCodes = parseList(env.getOrElse("WHO_INDICATOR_CODES", "")),
      pageSize = parseInt(env.getOrElse("WHO_PAGE_SIZE", ""), 100),
      devRunLimit = env.get("DEV_RUN_LIMIT").flatMap(_.trim.toIntOption),
      skipRequestErrors = parseBool(env.getOrElse("SKIP_REQUEST_ERRORS", ""), default = true))
}
