package graft.pipeline

/** Env-backed configuration, mirroring the reference's settings object
  * (/root/reference/app/config.py:4-22) key-for-key: S3 client fields,
  * per-layer bucket overrides (defaulting to the lake bucket), layer
  * prefixes and API paging.
  *
  * `lakeRoot` composes scheme+bucket so tests can point it at a local
  * directory while production uses s3a://bucket. The S3 fields feed
  * `SparkSessionFactory`, which turns them into `fs.s3a.*` Hadoop conf
  * (the Spark analogue of the reference's DuckDB `SET s3_*` calls,
  * /root/reference/app/io/duck.py:6-26).
  */
final case class Settings(
    lakeRoot: String,
    bronzePrefix: String,
    silverPrefix: String,
    goldPrefix: String,
    warehouseRoot: String,
    apiUrl: String,
    perPage: Int,
    maxPagesCap: Int = 10000,
    bronzeRoot: Option[String] = None,
    silverRoot: Option[String] = None,
    goldRoot: Option[String] = None,
    s3Endpoint: String = "http://minio:9000",
    awsKey: String = "minio",
    awsSecret: String = "minio12345",
    awsRegion: String = "us-east-1",
    qualityChecksPath: Option[String] = None,
    qualityConfigPath: Option[String] = None) {

  def bronzeDir(ingestionDate: String): String =
    s"${bronzeRoot.getOrElse(lakeRoot)}/$bronzePrefix/breweries/ingestion_date=$ingestionDate"

  def silverDir(ingestionDate: String): String =
    s"${silverRoot.getOrElse(lakeRoot)}/$silverPrefix/breweries/ingestion_date=$ingestionDate"

  def goldBaseDir(ingestionDate: String): String =
    s"${goldRoot.getOrElse(lakeRoot)}/$goldPrefix/breweries_counts/ingestion_date=$ingestionDate"

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
    perPage = env.getOrElse("PER_PAGE", "200").toInt,
    bronzeRoot = env.get("BRONZE_BUCKET").map(b => s"s3a://$b"),
    silverRoot = env.get("SILVER_BUCKET").map(b => s"s3a://$b"),
    goldRoot = env.get("GOLD_BUCKET").map(b => s"s3a://$b"),
    s3Endpoint = env.getOrElse("S3_ENDPOINT_URL", "http://minio:9000"),
    awsKey = env.getOrElse("AWS_ACCESS_KEY_ID", "minio"),
    awsSecret = env.getOrElse("AWS_SECRET_ACCESS_KEY", "minio12345"),
    awsRegion = env.getOrElse("AWS_DEFAULT_REGION", "us-east-1"),
    qualityChecksPath = env.get("QUALITY_CHECKS_PATH"),
    qualityConfigPath = env.get("QUALITY_CONFIG_PATH"))
}
