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

  /** Builder with the engine's standard conf + S3 wiring; `cpus` sizes
    * both the local master and shuffle partitions (production deploys
    * override master/shuffle via spark-submit, the fs.s3a.* entries
    * still apply). */
  def builder(settings: Settings, appName: String = "graft",
      cpus: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    s3aConf(settings).foldLeft(b) { case (bb, (k, v)) =>
      bb.config(s"spark.hadoop.$k", v)
    }
  }

  def create(settings: Settings, appName: String = "graft"): SparkSession =
    builder(settings, appName).getOrCreate()
}
