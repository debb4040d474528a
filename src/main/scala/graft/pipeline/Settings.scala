package graft.pipeline

/** Env-backed configuration, mirroring the reference's settings object
  * (/root/reference/app/config.py:4-22): same keys and defaults, minus
  * the S3-client fields (Spark takes those via fs.s3a.* Hadoop conf).
  *
  * `lakeRoot` composes scheme+bucket so tests can point it at a local
  * directory while production uses s3a://bucket.
  */
final case class Settings(
    lakeRoot: String,
    bronzePrefix: String,
    silverPrefix: String,
    goldPrefix: String,
    warehouseRoot: String,
    apiUrl: String,
    perPage: Int,
    maxPagesCap: Int = 10000) {

  def bronzeDir(ingestionDate: String): String =
    s"$lakeRoot/$bronzePrefix/breweries/ingestion_date=$ingestionDate"

  def silverDir(ingestionDate: String): String =
    s"$lakeRoot/$silverPrefix/breweries/ingestion_date=$ingestionDate"

  def goldBaseDir(ingestionDate: String): String =
    s"$lakeRoot/$goldPrefix/breweries_counts/ingestion_date=$ingestionDate"

  def warehouseTableDir: String = s"$warehouseRoot/gold_breweries_counts"
}

object Settings {
  def fromEnv(env: Map[String, String] = sys.env): Settings = Settings(
    lakeRoot = env.get("LAKE_ROOT")
      .orElse(env.get("LAKE_BUCKET").map(b => s"s3a://$b"))
      .getOrElse("s3a://breweries-lake"),
    bronzePrefix = env.getOrElse("LAYER_PREFIX_BRONZE", "bronze-layer"),
    silverPrefix = env.getOrElse("LAYER_PREFIX_SILVER", "silver-layer"),
    goldPrefix = env.getOrElse("LAYER_PREFIX_GOLD", "gold-layer"),
    warehouseRoot = env.getOrElse("WAREHOUSE_ROOT", "/data/warehouse"),
    apiUrl = env.getOrElse("API_URL", "https://api.openbrewerydb.org/v1/breweries"),
    perPage = env.getOrElse("PER_PAGE", "200").toInt)
}
