package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale properties of the MinHash b×r banding operator — the
  * document-side twin of [[LshSpec]]: precision grows with rows per
  * band, recall grows with bands, and exact duplicates can never be
  * missed. */
class MinHashLshSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")

  private def candidatePairs(cfg: MinHashLsh.Config): Set[(Long, Long)] = {
    val banded = MinHashLsh.explodeBands(docs, "text", cfg)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("adding bands only adds candidate pairs (monotone recall)") {
    val one = candidatePairs(MinHashLsh.Config(1, 2))
    val three = candidatePairs(MinHashLsh.Config(3, 2))
    assert(one.subsetOf(three),
      "band 0 of Config(1,2) and Config(3,2) use the same seeds, so " +
        "single-band candidates must survive adding bands")
  }

  test("growing rows per band only removes candidate pairs (monotone precision)") {
    // r=2 requires 2 simultaneous minima matches, r=1 only the first of
    // those two — so every r=2 candidate in band 0 is an r=1 candidate.
    val banded1 = MinHashLsh.explodeBands(docs, "text", MinHashLsh.Config(1, 1))
    val loose = banded1.as("a").join(banded1.as("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = candidatePairs(MinHashLsh.Config(1, 2))
    assert(tight.subsetOf(loose),
      "an (h0,h1) band match implies an h0 match; r=2 candidates must be ⊆ r=1's")
    assert(tight.size < loose.size, "r=2 should be strictly more selective here")
  }

  test("exact duplicate texts collide in every band (zero false negatives)") {
    val dup = docs.limit(5)
    val withDup = docs.unionAll(
      dup.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val cfg = MinHashLsh.Config(3, 2)
    val banded = MinHashLsh.explodeBands(withDup, "text", cfg)
    // each (original, copy) pair shares every per-seed minimum, hence
    // collides in ALL 3 bands — zero false negatives for exact dups
    val perPair = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("b.doc_id") === col("a.doc_id") + 1000000L)
      .groupBy(col("a.doc_id")).count()
    assert(perPair.count() === 5L)
    assert(perPair.filter(col("count") =!= cfg.bands).count() === 0L,
      "an exact dup must share all per-seed minima, hence all band keys")
    // and the pairs survive into the >1-doc candidate groups
    val groups = MinHashLsh.candidateGroups(banded, "doc_id")
    assert(groups.count() >= cfg.bands.toLong,
      "duplicate-holding buckets must surface as candidate groups")
  }

  test("min-label propagation finds connected components within the round bound") {
    import spark.implicits._
    // bucket graph: {1,2} {2,3} {3,4} chain + isolated {7} + pair {8,9}
    // chain diameter is 3 bucket hops from 4 back to 1
    val banded = Seq(
      (1L, 0, "a"), (2L, 0, "a"),
      (2L, 1, "b"), (3L, 1, "b"),
      (3L, 2, "c"), (4L, 2, "c"),
      (7L, 0, "z"),
      (8L, 1, "y"), (9L, 1, "y")).toDF("doc_id", "band", "band_key")
    def labels(rounds: Int): Map[Long, Long] =
      MinHashLsh.minLabelClusters(banded, "doc_id", rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val r3 = labels(3)
    assert(r3 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 8L, 9L -> 8L),
      "3 rounds must collapse the diameter-3 chain and leave singletons alone")
    // one round is NOT enough for the far end of the chain — the bound
    // is real, and extra rounds past convergence change nothing
    assert(labels(1)(4L) === 3L) // one hop: only bucket c's old min reached 4
    assert(labels(5) === r3)
  }

  test("universal family keeps the banding properties: monotone recall, zero exact-dup FN") {
    val one = candidatePairs(MinHashLsh.Config(1, 2, universal = true))
    val three = candidatePairs(MinHashLsh.Config(3, 2, universal = true))
    assert(one.subsetOf(three),
      "universal band 0 seeds are shared across configs with equal r")

    // exact duplicates share every per-seed minimum -> collide in all bands
    import spark.implicits._
    val dups = Seq((1L, "identical content here"), (2L, "identical content here"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val banded = MinHashLsh.explodeBands(dups, "text", MinHashLsh.Config(3, 2, universal = true))
    val together = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"), col("a.band")).distinct().count()
    assert(together === 3L, "the dup pair must collide in all 3 bands")
  }

  test("short texts (< 3 chars, no shingles) are dropped, not nulled") {
    import spark.implicits._
    val tiny = Seq((1L, "ab"), (2L, "abcdef"), (3L, "abcdef")).toDF("doc_id", "text")
    val banded = MinHashLsh.explodeBands(tiny, "text", MinHashLsh.Config(2, 2))
    assert(banded.filter(col("doc_id") === 1L).count() === 0L)
    assert(banded.count() === 4L) // 2 docs × 2 bands
    val groups = MinHashLsh.candidateGroups(banded, "doc_id")
    assert(groups.count() === 2L) // the identical pair collides in both bands
    assert(groups.agg(min("canonical_id")).head().getLong(0) === 2L)
  }
}
