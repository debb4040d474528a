package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative, data-driven quality checks — the engine-side equivalent
  * of the reference's Soda Core scans, where checks are configuration
  * rather than code (/root/reference/soda/checks/silver_breweries.yml:2-7,
  * /root/reference/soda/checks/gold_breweries.yml:1-3; SURVEY.md G7).
  *
  * A [[Check]] names a metric over a dataset and a strict lower bound.
  * All checks against one dataset are evaluated in a SINGLE aggregate
  * pass (one job, no per-check scans) — the shape that holds when the
  * dataset is 100 TB.
  */
object Quality {

  /** The metric a check observes. */
  sealed trait Metric { def column(df: DataFrame): Column }
  /** `row_count` in Soda terms. */
  case object RowCount extends Metric {
    def column(df: DataFrame): Column = count(lit(1))
  }
  /** `max(col)` in Soda terms; empty/all-null observes 0. */
  final case class MaxOf(col: String) extends Metric {
    def column(df: DataFrame): Column =
      coalesce(max(df.col(col)).cast("long"), lit(0L))
  }

  /** One declarative expectation: metric must be strictly greater than
    * `gt` (both reference YAMLs only use `> 0`; the bound is a
    * parameter so new expectations are data, not code). */
  final case class Check(name: String, metric: Metric, gt: Long = 0L)

  final case class CheckResult(name: String, passed: Boolean, observed: Long)

  /** Evaluates every check in one aggregate job over the dataset. */
  def evaluate(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] = {
    if (checks.isEmpty) return Nil
    val row = df.agg(
      checks.head.metric.column(df).as(checks.head.name),
      checks.tail.map(c => c.metric.column(df).as(c.name)): _*).head()
    checks.zipWithIndex.map { case (c, i) =>
      val observed = row.getLong(i)
      CheckResult(c.name, observed > c.gt, observed)
    }
  }

  /** The reference's two check suites, replayed as a config literal. */
  val silverSuite: Seq[Check] = Seq(
    Check("silver_row_count_gt_0", RowCount))
  val goldSuite: Seq[Check] = Seq(
    Check("gold_row_count_gt_0", RowCount),
    Check("gold_max_brewery_count_gt_0", MaxOf("brewery_count")))

  def silverChecks(silver: DataFrame): Seq[CheckResult] =
    evaluate(silver, silverSuite)

  def goldChecks(gold: DataFrame): Seq[CheckResult] =
    evaluate(gold, goldSuite)

  def run(spark: SparkSession, settings: Settings,
      ingestionDate: String): Seq[CheckResult] = {
    val silver = spark.read.parquet(settings.silverDir(ingestionDate))
    val gold = spark.read.parquet(settings.warehouseTableDir)
      .filter(col("ingestion_date") === to_date(lit(ingestionDate)))
    silverChecks(silver) ++ goldChecks(gold)
  }
}
