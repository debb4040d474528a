package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine data-quality checks — the Soda Core scans of the reference
  * (/root/reference/soda/checks/silver_breweries.yml:2-7,
  *  /root/reference/soda/checks/gold_breweries.yml:1-3) as plain
  * assertions over DataFrames (SURVEY.md G7).
  */
object Quality {

  final case class CheckResult(name: String, passed: Boolean, observed: Long)

  def silverChecks(silver: DataFrame): Seq[CheckResult] = {
    val n = silver.count()
    Seq(CheckResult("silver_row_count_gt_0", n > 0, n))
  }

  def goldChecks(gold: DataFrame): Seq[CheckResult] = {
    val agg = gold.agg(
      count(lit(1)).as("n"),
      coalesce(max(col("brewery_count")), lit(0L)).as("max_count")).head()
    val n = agg.getLong(0)
    val maxCount = agg.getLong(1)
    Seq(
      CheckResult("gold_row_count_gt_0", n > 0, n),
      CheckResult("gold_max_brewery_count_gt_0", maxCount > 0, maxCount))
  }

  def run(spark: SparkSession, settings: Settings,
      ingestionDate: String): Seq[CheckResult] = {
    val silver = spark.read.parquet(settings.silverDir(ingestionDate))
    val gold = spark.read.parquet(settings.warehouseTableDir)
      .filter(col("ingestion_date") === to_date(lit(ingestionDate)))
    silverChecks(silver) ++ goldChecks(gold)
  }
}
