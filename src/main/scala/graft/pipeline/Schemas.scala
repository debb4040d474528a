package graft.pipeline

import org.apache.spark.sql.types._

/** Declared schemas for the medallion layers.
  *
  * Bronze is an explicit all-string StructType over the 10 raw fields the
  * silver SQL touches (/root/reference/app/tasks/silver.py:22-35) — we
  * declare instead of inferring so `state_province` always exists even
  * when absent from a page (it is COALESCE'd into `state`, silver.py:27-30)
  * and so Spark/DuckDB inference divergence can't change the contract.
  *
  * Silver is the 9-column shape pinned by the reference's unit test
  * (/root/reference/tests/unit/test_transform_silver.py:18-20) with
  * lat/long as DOUBLE (silver.py:33-34).
  */
object Schemas {

  /** Scala image of the reference's Pydantic model
    * (/root/reference/app/utils/models.py:4-13). */
  final case class Brewery(
      id: String,
      name: Option[String],
      brewery_type: Option[String],
      country: Option[String],
      state: Option[String],
      city: Option[String],
      postal_code: Option[String],
      latitude: Option[Double],
      longitude: Option[Double])

  val bronzeFields: Seq[String] = Seq(
    "id", "name", "brewery_type", "country", "state", "state_province",
    "city", "postal_code", "latitude", "longitude")

  val bronze: StructType =
    StructType(bronzeFields.map(f => StructField(f, StringType, nullable = true)))

  val silver: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("brewery_type", StringType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("state", StringType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("postal_code", StringType, nullable = true),
    StructField("latitude", DoubleType, nullable = true),
    StructField("longitude", DoubleType, nullable = true)))

  /** Gold history table DDL image (/root/reference/app/tasks/gold.py:91-99). */
  val goldHistory: StructType = StructType(Seq(
    StructField("ingestion_date", DateType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("state", StringType, nullable = true),
    StructField("brewery_type", StringType, nullable = true),
    StructField("brewery_count", LongType, nullable = true)))
}
