package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale properties of the parameterized multi-band LSH operator:
  * precision grows with planes-per-band, recall grows with bands, and
  * the bucket-size cap actually splits oversized buckets. */
class LshSpec extends SparkSpec {

  private def quantized: DataFrame =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("qv"))

  private def maxBucketSize(r: Int): Long =
    Lsh.explodeBands(quantized, "qv", Lsh.Config(1, r))
      .groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)

  test("max bucket size shrinks as planes-per-band grow") {
    val sizes = Seq(2, 4, 6, 8).map(r => r -> maxBucketSize(r))
    sizes.sliding(2).foreach { case Seq((ra, a), (rb, b)) =>
      assert(b <= a, s"r=$rb bucket max $b > r=$ra bucket max $a")
    }
    assert(sizes.last._2 < sizes.head._2,
      s"growing planes 2→8 did not shrink the largest bucket: $sizes")
  }

  test("adding bands only adds candidate pairs (monotone recall)") {
    def pairs(cfg: Lsh.Config): Set[(Long, Long)] =
      Lsh.selfJoinPairs(Lsh.explodeBands(quantized, "qv", cfg), "vec_id")
        .select("vec_id_a", "vec_id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(Lsh.Config(1, 6))
    val three = pairs(Lsh.Config(3, 6))
    assert(one.subsetOf(three),
      "band 0 of Config(1,6) and Config(3,6) use the same planes, so " +
        "single-band candidates must survive adding bands")
    assert(three.size > one.size, "extra bands should find extra candidates")
  }

  test("identical vectors always land in the same buckets (zero false negatives for exact dups)") {
    val dup = quantized.limit(5)
    val withDup = quantized.unionAll(
      dup.select((col("vec_id") + 1000000L).as("vec_id"), col("qv")))
    val cfg = Lsh.Config(2, 8)
    val found = Lsh.selfJoinPairs(Lsh.explodeBands(withDup, "qv", cfg), "vec_id")
      .filter(col("vec_id_b") === col("vec_id_a") + 1000000L)
      .select("vec_id_a").distinct().count()
    assert(found === 5L)
  }

  test("refineOversized caps bucket sizes by re-splitting with extra planes") {
    val cfg = Lsh.Config(1, 2) // 4 coarse buckets → guaranteed overflow
    val banded = Lsh.explodeBands(quantized, "qv", cfg)
    val before = banded.groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    val cap = (before / 2).toInt max 1
    val refined = Lsh.refineOversized(banded, "qv", cfg, maxBucket = cap, extra = 3)
    val after = refined.groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(refined.count() === banded.count(), "re-split must not drop rows")
    assert(after < before, s"refinement did not shrink the largest bucket ($before → $after)")
    // refined keys are disjoint from un-refined ones (sentinel high bits)
    val smallMax = (1L << cfg.rowsPerBand) - 1
    val overlap = refined.filter(col("bucket") > smallMax)
      .join(banded, Seq("band", "bucket")).count()
    assert(overlap === 0L)
  }

  test("SrpKernel buckets == the HOF bandBucketCol formulation (the oracle's math)") {
    for ((b, r) <- Seq((1, 2), (3, 6), (2, 8))) {
      val cfg = Lsh.Config(b, r)
      val viaKernel = Lsh.explodeBands(quantized, "qv", cfg)
        .select("vec_id", "band", "bucket")
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
      val viaHof = quantized.select(
          col("vec_id"),
          posexplode(array((0 until b).map(j =>
            Lsh.bandBucketCol("qv", j, r)): _*)).as(Seq("band", "bucket")))
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
      assert(viaKernel === viaHof, s"cfg=($b, $r)")
    }
  }

  test("iterated refinement keeps shrinking still-oversized buckets") {
    val cfg = Lsh.Config(1, 2)
    val banded = Lsh.explodeBands(quantized, "qv", cfg)
    def maxAfter(rounds: Int): Long =
      Lsh.refineOversized(banded, "qv", cfg, maxBucket = 10, extra = 1, rounds = rounds)
        .groupBy("band", "bucket").count()
        .agg(max("count")).head().getLong(0)
    // extra=1 splits an oversized bucket into at most 2 children per
    // round — one round cannot reach a cap of 10 from ~125-row buckets,
    // more rounds must monotonically shrink the worst bucket
    val sizes = Seq(1, 2, 3, 4).map(maxAfter)
    sizes.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"round added size: $sizes")
    }
    assert(sizes.last < sizes.head,
      s"three extra rounds did not shrink the worst bucket: $sizes")
    // rounds never drop or duplicate rows
    val r4 = Lsh.refineOversized(banded, "qv", cfg, maxBucket = 10, extra = 1, rounds = 4)
    assert(r4.count() === banded.count())
  }
}
