package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for q192 at a scale fixture (temporary). */
object Q192Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("GRAFT_SCALE_B", "/tmp/graft_scale/x25")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Log.quietAuditedWarnings()
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q192] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val s = spark
    for (round <- 0 to 1) {
      println(s"== round $round")
      val cfg = graft.operators.MinHashLsh.Config(bands = 1, rowsPerBand = 6)
      var banded: org.apache.spark.sql.DataFrame = null
      val np = Tables.scaledPartitions(s, dir, Seq("documents"))
      timed(s"banded_kernel+checkpoint np=$np")({
        banded = graft.Checkpoints.materialize(
          graft.operators.MinHashLsh.explodeBands(
            Tables.load(s, dir, "documents").select("doc_id", "text")
              .repartition(np, col("doc_id")), "text", cfg)
            .select("doc_id", "band", "band_key"))})
      var clusters: org.apache.spark.sql.DataFrame = null
      timed("minLabelClusters_3r")({
        clusters = graft.operators.MinHashLsh
          .minLabelClusters(banded, "doc_id", rounds = 3, persistEdges = false)})
      var splits: org.apache.spark.sql.DataFrame = null
      timed("splits_checkpoint")({
        splits = graft.Checkpoints.materialize(clusters.select(col("doc_id"),
          (graft.Knuth.col(col("cluster_id"), 7919L) % 10).as("sp_cluster"),
          (graft.Knuth.col(col("doc_id"), 7919L) % 10).as("sp_naive")))})
      var joint: org.apache.spark.sql.DataFrame = null
      timed("joint_checkpoint")({
        joint = graft.Checkpoints.materialize(
          banded.join(splits, "doc_id")
            .groupBy("band", "band_key", "sp_naive", "sp_cluster")
            .agg(count(lit(1)).as("c")))})
      timed("audits") {
        def audit(sp: String, label: String) = {
          val leak = joint
            .groupBy(col("band"), col("band_key"), col(sp).as("sp"))
            .agg(sum(col("c")).as("ns"))
            .groupBy("band", "band_key")
            .agg(sum(col("ns")).as("n"),
              sum(col("ns") * (col("ns") - 1)).as("intra"))
            .agg(expr("sum(n * (n - 1) - intra) div 2").as("n_leak_incidences"))
          splits.agg(
              sum(when(col(sp) <= 7, 1L).otherwise(0L)).as("n_train"),
              sum(when(col(sp) === 8, 1L).otherwise(0L)).as("n_val"),
              sum(when(col(sp) === 9, 1L).otherwise(0L)).as("n_test"))
            .crossJoin(broadcast(leak))
            .select(lit(label).as("strategy"), col("n_train"), col("n_val"),
              col("n_test"), col("n_leak_incidences"))
        }
        audit("sp_naive", "naive").unionByName(audit("sp_cluster", "cluster"))
          .queryExecution.toRdd.count(): Unit
      }
    }
    spark.stop()
  }
}
