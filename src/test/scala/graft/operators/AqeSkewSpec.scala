package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join evidence: the OTHER half of the skew story next to
  * `operators/SkewJoin` (manual salting). Manual salting pre-plans the
  * split with a replication factor chosen blind; AQE measures actual
  * partition sizes after the map stage and splits only the partitions
  * that ARE skewed. At 100 TB both run together: salting for the keys
  * known to be pathological, AQE for the ones that only show up in
  * production data. This spec pins that runtime splitting engages on a
  * genuinely skewed shuffle join in this engine's session layout.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: one pathological key carries 200k wide rows, 99 keys are tiny
      val left = spark.range(200000)
        .select(when(col("id") < 199000, 0L).otherwise(col("id") % 100).as("k"),
          concat(lit("x"), col("id").cast("string"),
            lit("-" * 64)).as("payload"))
      val right = spark.range(100).select(col("id").as("k"),
        col("id").cast("string").as("rv"))
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count() would plan a separate,
      // aggregated query) so AQE finalizes the adaptive plan
      val qe = joined.queryExecution
      assert(qe.toRdd.count() === 200000L)

      // the final adaptive plan nests inside query stages, which
      // TreeNode.collect does not descend into — assert on the
      // rendered plan, where the skew markers are unambiguous
      val rendered = (qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(rendered.contains("skew=true"),
        s"AQE must mark the join as skew-optimized:\n$rendered")
      assert(rendered.contains("AQEShuffleRead skewed"),
        s"the skewed partition must be split at read time:\n$rendered")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
