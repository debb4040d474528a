package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two as-of implementations (union+window composition vs the
  * native custom-operator route) must agree row-for-row — on real data
  * and on crafted edges. */
class AsOfJoinSpec extends SparkSpec {

  test("native as-of equals the union+window composition on events") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("cts"))
      .agg(max(col("event_id")).as("click_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))

    val native = AsOfJoin.joinAsOfNative(
      errors, clicks, "user_id", "ts", "c_user", "cts")
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    val composed = AsOfJoin.joinAsOf(
      errors,
      clicks.withColumnRenamed("c_user", "user_id"),
      keys = Seq("user_id"), leftTime = "ts", rightTime = "cts",
      payload = Seq("click_id", "cts"))
      .select("event_id", "click_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    assert(native.nonEmpty)
    assert(native === composed)
  }

  test("native as-of edge cases: equal ts matches, no-predecessor nulls") {
    import spark.implicits._
    val probe = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 10L, 12L))
      .toDF("k", "t", "probe_id")
    val ref = Seq((1L, 100L, 900L), (1L, 40L, 901L), (3L, 5L, 902L))
      .toDF("rk", "rt", "ref_id")
    val out = AsOfJoin.joinAsOfNative(probe, ref, "k", "t", "rk", "rt")
      .select("probe_id", "ref_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(10L) === 900L) // equal timestamp matches (>= semantics)
    assert(out(11L) === 901L) // strictly-before match
    assert(out(12L) === -1L)  // key has no reference rows → null
  }
}
