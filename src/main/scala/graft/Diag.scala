package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic main (not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // match Bench: generated-class cache sized to the registry, so
      // steady-state numbers here are comparable to measured rounds
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Log.quietAuditedWarnings()
    val names = args.toSeq
    val qs = SparkEntry.allQueries.filter(q => names.contains(q.name))
    for (q <- qs; i <- 1 to 3) {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).queryExecution.toRdd.count()
      println(f"[diag] ${q.name} run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    qs.foreach(q => q.build(spark, sfDir).explain("formatted"))
    spark.stop()
  }
}
