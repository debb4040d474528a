package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bucketed range join must equal the naive theta join pair for
  * pair, while planning as a hash equi-join (no nested loop, no
  * cartesian product). */
class RangeJoinSpec extends SparkSpec {

  private def sides: (DataFrame, DataFrame) = {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("iid"),
        unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + 300000000L).as("e_us"))
    val points = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("pid"), unix_micros(col("ts")).as("t_us"))
    (points, intervals)
  }

  test("bucketed range join == naive theta join, each pair exactly once") {
    val (points, intervals) = sides
    val bucketed = RangeJoin.pointInInterval(points, "t_us", intervals,
      "s_us", "e_us", bucketUs = 300000000L)
      .select("iid", "pid")
    val rows = bucketed.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.distinct.length, "a pair surfaced twice")
    val naive = intervals.join(points,
        col("t_us") >= col("s_us") && col("t_us") < col("e_us"))
      .select("iid", "pid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSet === naive.toSet)
    assert(rows.nonEmpty, "fixture produced no in-window pairs")
  }

  test("bucket granularity does not change results") {
    val (points, intervals) = sides
    def pairs(bucketUs: Long): Set[(Long, Long)] =
      RangeJoin.pointInInterval(points, "t_us", intervals,
        "s_us", "e_us", bucketUs)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(300000000L) === pairs(60000000L))
    assert(pairs(300000000L) === pairs(3600000000L))
  }

  test("plans as a hash equi-join on the bucket — no nested loop, no cartesian") {
    val (points, intervals) = sides
    val plan = RangeJoin.pointInInterval(points, "t_us", intervals,
      "s_us", "e_us", bucketUs = 300000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the naive theta formulation, by contrast, IS a nested loop
    val naivePlan = intervals.join(points,
        col("t_us") >= col("s_us") && col("t_us") < col("e_us"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"))
  }
}
