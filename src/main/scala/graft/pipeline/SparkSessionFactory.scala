package graft.pipeline

import java.net.URI

import org.apache.spark.sql.SparkSession

/** Builds (or configures) a SparkSession wired for the lake's
  * S3-compatible object store — the Spark analogue of the reference's
  * DuckDB client setup (/root/reference/app/io/duck.py:6-26), key for
  * key: endpoint host:port parsed from a URL, ssl from the URL scheme,
  * path-style addressing, region and static credentials.
  *
  * Everything is expressed as `fs.s3a.*` Hadoop configuration so any
  * `s3a://bucket/...` path read or written by the session (bronze
  * puts, silver/gold parquet, warehouse) goes to the configured
  * endpoint — MinIO in the reference's docker-compose, real S3 when
  * the endpoint is https.
  */
object SparkSessionFactory {

  /** The `fs.s3a.*` entries implied by the settings — pure, unit-testable. */
  def s3aConf(settings: Settings): Map[String, String] = {
    val uri = URI.create(settings.s3Endpoint)
    val scheme = Option(uri.getScheme).getOrElse("http").toLowerCase
    val host = Option(uri.getHost).getOrElse("minio")
    val port = if (uri.getPort > 0) uri.getPort
               else if (scheme == "https") 443 else 9000
    Map(
      "fs.s3a.endpoint" -> s"$host:$port",
      "fs.s3a.connection.ssl.enabled" -> (scheme == "https").toString,
      "fs.s3a.path.style.access" -> "true",
      "fs.s3a.endpoint.region" -> settings.awsRegion,
      "fs.s3a.access.key" -> settings.awsKey,
      "fs.s3a.secret.key" -> settings.awsSecret,
      "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
  }

  /** Applies the S3 wiring to an already-running session (tests,
    * notebooks). */
  def configure(spark: SparkSession, settings: Settings): Unit =
    s3aConf(settings).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }

  /** True when spark-submit (or the test harness) already chose a
    * value for `key`: spark-submit materialises --master/--conf as
    * `spark.*` system properties before the driver main runs, so a
    * code-set builder value would override the deploy-time choice —
    * the wrong precedence for a library. */
  private def deployProvided(key: String): Boolean =
    sys.props.get(key).exists(_.nonEmpty)

  /** The conf entries `builder` applies — pure, unit-testable. `cpus`
    * sizes the local master and shuffle partitions ONLY when the
    * deployment hasn't already chosen them (`provided`); the standard
    * conf and fs.s3a.* entries always apply. */
  def builderConf(settings: Settings, cpus: Int,
      provided: String => Boolean = deployProvided): Map[String, String] = {
    val master =
      if (provided("spark.master")) Map.empty[String, String]
      else Map("spark.master" -> s"local[$cpus]")
    val shuffle =
      if (provided("spark.sql.shuffle.partitions")) Map.empty[String, String]
      else Map("spark.sql.shuffle.partitions" -> cpus.toString)
    master ++ shuffle ++ Map(
      "spark.sql.session.timeZone" -> "UTC",
      "spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.extensions" -> "graft.plans.GraftExtensions") ++
      s3aConf(settings).map { case (k, v) => s"spark.hadoop.$k" -> v }
  }

  /** Builder with the engine's standard conf + S3 wiring; master and
    * shuffle partitions are left to spark-submit when it provided them
    * (code-set builder conf would otherwise override the deploy-time
    * choice and pin the app to local mode). */
  def builder(settings: Settings, appName: String = "graft",
      cpus: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    builderConf(settings, cpus).foldLeft(SparkSession.builder().appName(appName)) {
      case (b, (k, v)) => b.config(k, v)
    }

  def create(settings: Settings, appName: String = "graft"): SparkSession =
    builder(settings, appName).getOrCreate()
}
