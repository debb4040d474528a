package graft.operators

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.exchange.Exchange

/** Bucketing evidence: two tables bucketed on the join key join with
  * ZERO shuffle exchanges — the co-located-join layout for repeated
  * fact-fact joins at scale (SURVEY.md "partitioning & shuffle").
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle") {
    // explicit table paths — the (static) warehouse dir is never used
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val sf = "/root/testdata/sf0.001"
    // tiny test tables would be broadcast; disable so the bucketed
    // sort-merge path (the at-scale plan) is what gets exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // AQE wraps the plan in AdaptiveSparkPlanExec (a leaf for collect());
    // turn it off so the join node is visible to the plan assertions
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {

    Tables.load(spark, sf, "lineitem")
      .write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_bucketed")
      .saveAsTable("li_bucketed")
    Tables.load(spark, sf, "orders")
      .write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_bucketed")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        spark.table("li_bucketed")("l_orderkey") ===
          spark.table("o_bucketed")("o_orderkey"))
      .groupBy("o_orderstatus").count()

    // correctness: same result as the plain (shuffled) join
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    assert(joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)

    // plan: the join itself runs without any Exchange below it — only
    // the final aggregation may shuffle
    joined.queryExecution.executedPlan // force planning
    val joinNode = joined.queryExecution.executedPlan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joinNode.isDefined, "expected a sort-merge join over bucketed scans")
    val exchangesUnderJoin = joinNode.get.collect { case e: Exchange => e }
    assert(exchangesUnderJoin.isEmpty,
      s"bucketed join must not shuffle, found: $exchangesUnderJoin")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
