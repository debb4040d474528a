package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** Sequential medallion orchestration with per-stage retry —
  * bronze → silver → gold → quality
  * (/root/reference/app/pipeline.py:10-29; task retries
  * /root/reference/app/tasks/extract.py:29, silver.py:5, gold.py:44).
  */
object Pipeline {

  final case class RunReport(
      ingestionDate: String,
      pages: Int,
      records: Int,
      silverRows: Long,
      goldBaseDir: String,
      checks: Seq[Quality.CheckResult]) {
    def allChecksPassed: Boolean = checks.forall(_.passed)
  }

  /** Simple retry wrapper (the engine-scope analogue of Prefect task
    * retries: attempts = retries + 1, fixed delay). Only non-fatal
    * failures are retried — fatal JVM errors (OOM, linkage) and
    * interrupts propagate immediately. */
  def retry[A](attempts: Int, delayMs: Long = 5000)(f: => A): A =
    try f catch {
      case scala.util.control.NonFatal(_) if attempts > 1 =>
        Thread.sleep(delayMs)
        retry(attempts - 1, delayMs)(f)
    }

  def run(spark: SparkSession, settings: Settings, source: Bronze.PageSource,
      ingestionDate: Option[String] = None,
      retryDelayMs: Long = 5000): RunReport = {
    val d = ingestionDate.getOrElse(LocalDate.now().toString)
    Log.info("pipeline_start", "ingestion_date" -> d)
    val (pages, records) =
      retry(3, retryDelayMs)(Bronze.ingest(spark, settings, source, d))
    Log.info("bronze_done", "ingestion_date" -> d,
      "pages" -> pages, "records" -> records)
    val silverRows =
      retry(3, retryDelayMs)(Silver.transform(spark, settings, d))
    Log.info("silver_done", "ingestion_date" -> d, "rows" -> silverRows)
    val goldBase =
      retry(3, retryDelayMs)(Gold.aggregate(spark, settings, d))
    Log.info("gold_done", "ingestion_date" -> d, "base_dir" -> goldBase)
    val checks = Quality.run(spark, settings, d)
    Log.info("quality_done", "ingestion_date" -> d,
      "checks" -> checks.size, "failed" -> checks.count(!_.passed))
    RunReport(d, pages, records, silverRows, goldBase, checks)
  }
}
