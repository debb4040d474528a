package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main (not part of the driver contract): writes
  * `explain("formatted")` for the named queries to files, so plan
  * shapes can be archived per optimization round without paying
  * Diag's 3 timed executions.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query>...
  * writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Log.quietAuditedWarnings()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.allQueries.filter(q => names.contains(q.name)).foreach { q =>
      val df = q.build(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q.name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${q.name}_$suffix.txt")
    }
    spark.stop()
  }
}
