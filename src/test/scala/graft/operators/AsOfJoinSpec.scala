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

  test("native as-of tolerance: stale best match nulls out") {
    import spark.implicits._
    val probe = Seq((1L, 100L, 10L), (1L, 1000L, 11L)).toDF("k", "t", "probe_id")
    val ref = Seq((1L, 90L, 900L)).toDF("rk", "rt", "ref_id")
    val out = AsOfJoin.joinAsOfNative(
      probe, ref, keys = Seq("k" -> "rk"), leftTime = "t", rightTime = "rt",
      tolerance = Some(50L))
      .select("probe_id", "ref_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(10L) === 900L) // gap 10 <= 50 → match
    assert(out(11L) === -1L)  // gap 910 > 50 → nulls, same as no match
  }

  test("native as-of composite string keys survive sorter row reuse") {
    // String keys eval'd from the sorter's reused UnsafeRow point into
    // recycled pages — the exec must re-eval buffered keys from the
    // copied row. Enough rows across enough string keys that the sort
    // iterator definitely recycles its buffer mid-merge.
    import spark.implicits._
    val n = 5000
    val probe = (0 until n).map { i =>
      (s"tenant_${i % 97}", s"dev_${i % 13}", (i / 7).toLong * 10 + 5, i.toLong)
    }.toDF("tenant", "dev", "t", "probe_id")
    val ref = (0 until n).map { i =>
      (s"tenant_${i % 97}", s"dev_${i % 13}", (i / 7).toLong * 10, 100000L + i)
    }.toDF("r_tenant", "r_dev", "rt", "ref_id").distinct()

    val out = AsOfJoin.joinAsOfNative(
      probe, ref,
      keys = Seq("tenant" -> "r_tenant", "dev" -> "r_dev"),
      leftTime = "t", rightTime = "rt", tolerance = None)

    // oracle: plain SQL greatest-rt-per-probe via window over an equi-join
    probe.createOrReplaceTempView("asof_probe")
    ref.createOrReplaceTempView("asof_ref")
    val expect = spark.sql("""
      SELECT p.probe_id, max_by(r.ref_id, r.rt) AS ref_id
      FROM asof_probe p JOIN asof_ref r
        ON p.tenant = r.r_tenant AND p.dev = r.r_dev AND r.rt <= p.t
      GROUP BY p.probe_id""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val got = out.select("probe_id", "ref_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got.size === n)
    val matched = got.filter(_._2 >= 0)
    assert(matched.nonEmpty)
    matched.foreach { case (pid, rid) => assert(expect(pid) === rid, s"probe $pid") }
    got.filter(_._2 < 0).keys.foreach(pid => assert(!expect.contains(pid), s"probe $pid"))
  }
}
