package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold aggregation: base counts, warehouse history partition, rollup
  * family, partitioned exports and run views
  * (/root/reference/app/tasks/gold.py:45-180).
  *
  * The reference's DELETE + INSERT idempotency on the DuckDB history
  * table (gold.py:100-113) maps to a dynamic INSERT OVERWRITE of the
  * ingestion_date partition — same end state, one operation. Its four
  * per-run re-reads of the history table (gold.py:118-178) collapse to
  * one cached run-slice that feeds the three rollups and four exports.
  */
object Gold {

  /** G1 base aggregation (gold.py:74-86): NULL dims → '' *before*
    * grouping, then count. */
  def baseCounts(silver: DataFrame): DataFrame =
    silver.groupBy(
      coalesce(col("country"), lit("")).as("country"),
      coalesce(col("state"), lit("")).as("state"),
      coalesce(col("brewery_type"), lit("")).as("brewery_type"))
      .agg(count(lit(1)).as("brewery_count"))

  /** G2 rollup family (gold.py:133-170): three coarser grains summed
    * from the finest. */
  def byCountryType(base: DataFrame): DataFrame =
    base.groupBy("country", "brewery_type")
      .agg(sum("brewery_count").as("brewery_count"))

  def byStateType(base: DataFrame): DataFrame =
    base.groupBy("state", "brewery_type")
      .agg(sum("brewery_count").as("brewery_count"))

  def byType(base: DataFrame): DataFrame =
    base.groupBy("brewery_type")
      .agg(sum("brewery_count").as("brewery_count"))

  private def writeGold(df: DataFrame, dest: String,
      partitionBy: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dest)
  }

  /** Full gold stage; returns the base export dir (gold.py:180). */
  def aggregate(spark: SparkSession, settings: Settings,
      ingestionDate: String): String = {
    val silver = spark.read.parquet(settings.silverDir(ingestionDate))
    val base = baseCounts(silver)

    // History partition: dynamic overwrite of this run's slice
    // (D2 ≡ DELETE+INSERT, gold.py:100-113).
    base.withColumn("ingestion_date", to_date(lit(ingestionDate)))
      .select("ingestion_date", "country", "state", "brewery_type", "brewery_count")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingestion_date")
      .parquet(settings.warehouseTableDir)

    // Re-read this run's slice from the warehouse (partition-pruned scan,
    // F3) and cache it — it feeds all four exports.
    val run = spark.read.parquet(settings.warehouseTableDir)
      .filter(col("ingestion_date") === to_date(lit(ingestionDate)))
      .select("country", "state", "brewery_type", "brewery_count")
      .cache()
    try {
      val baseDir = settings.goldBaseDir(ingestionDate)

      val finest = run.orderBy("country", "state", "brewery_type")
      writeGold(finest, s"$baseDir/by_country_state_type",
        Seq("country", "state", "brewery_type"))
      finest.createOrReplaceTempView("v_gold_by_country_state_type_run")

      val ct = byCountryType(run).orderBy("country", "brewery_type")
      writeGold(ct, s"$baseDir/by_country_type", Seq("country", "brewery_type"))
      ct.createOrReplaceTempView("v_gold_by_country_type_run")

      val st = byStateType(run).orderBy("state", "brewery_type")
      writeGold(st, s"$baseDir/by_state_type", Seq("state", "brewery_type"))
      st.createOrReplaceTempView("v_gold_by_state_type_run")

      val ty = byType(run).orderBy("brewery_type")
      writeGold(ty, s"$baseDir/by_type", Seq("brewery_type"))
      ty.createOrReplaceTempView("v_gold_by_type_run")

      baseDir
    } finally run.unpersist()
  }
}
