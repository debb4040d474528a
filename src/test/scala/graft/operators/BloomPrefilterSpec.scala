package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BloomPrefilter contract: no false negatives ever, a small
  * false-positive tail, and exact semi-join equivalence end-to-end on
  * real tables.
  */
class BloomPrefilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every true member passes the prefilter") {
    val orders = Tables.load(spark, sf, "orders")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // probe the filter with exactly the build keys — all must survive
    val kept = BloomPrefilter.prefilter(
      urgent.withColumnRenamed("o_orderkey", "k"), "k", urgent, "o_orderkey")
    assert(kept.count() === urgent.count())
  }

  test("false positives are a small tail, removed by the exact join") {
    val orders = Tables.load(spark, sf, "orders")
    val lineitem = Tables.load(spark, sf, "lineitem")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")

    val exact = lineitem.join(urgent,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    val prefiltered = BloomPrefilter.prefilter(
      lineitem, "l_orderkey", urgent, "o_orderkey")
    val nExact = exact.count()
    val nPre = prefiltered.count()
    val nAll = lineitem.count()
    // prefilter keeps every match plus at most a small FP tail: with
    // ~600 build keys in 2^18 bits the expected FP rate is ≪ 1%, so
    // anything past 5% of the non-matching rows means broken hashing
    assert(nPre >= nExact, "prefilter must never drop a match")
    assert(nPre - nExact <= (nAll - nExact) / 20,
      s"FP tail too large: kept $nPre of $nAll, exact $nExact")

    val viaBloom = BloomPrefilter.semiJoin(
      lineitem, "l_orderkey", urgent, "o_orderkey")
    assert(viaBloom.count() === nExact)
    // identical row multiset, not just count
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
  }

  test("bitmap is tiny and deterministic across partitionings") {
    val orders = Tables.load(spark, sf, "orders").select("o_orderkey")
    val one = BloomPrefilter.build(orders.repartition(1), "o_orderkey")
      .selectExpr("posexplode(__bloom) AS (w, bits)")
    val many = BloomPrefilter.build(orders.repartition(7), "o_orderkey")
      .selectExpr("posexplode(__bloom) AS (w, bits)")
    // identical dense word array regardless of partitioning — bitwise
    // OR is commutative/associative/idempotent
    assert(one.exceptAll(many).isEmpty && many.exceptAll(one).isEmpty)
    // dense bitmap: exactly numBits/64 words, a 32 KB broadcast
    assert(one.count() === (1 << 18) / 64)
  }
}
