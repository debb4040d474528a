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
    val (pages, records) =
      retry(3, retryDelayMs)(Bronze.ingest(spark, settings, source, d))
    val silverRows =
      retry(3, retryDelayMs)(Silver.transform(spark, settings, d))
    val goldBase =
      retry(3, retryDelayMs)(Gold.aggregate(spark, settings, d))
    val checks = Quality.run(spark, settings, d)
    RunReport(d, pages, records, silverRows, goldBase, checks)
  }
}
