package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic properties of the curation queries that an oracle hash
  * match alone cannot express: blocking exhaustiveness (q69 finds
  * EVERY pair the brute force finds), lossless chunking (q73 windows
  * reassemble to the document), and the statistical contracts of the
  * hash-driven split/mix decisions. */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q69 banding is exhaustive: equals the all-pairs hamming<=3 ground truth") {
    val sims = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        graft.functions.SimHash.simhash16(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val truth = (for {
      (da, sa) <- sims; (db, sb) <- sims
      if db > da && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (da, db, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
    val got = run("q69_simhash_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth,
      s"banded join must find exactly the brute-force pairs " +
        s"(got ${got.size}, truth ${truth.size})")
  }

  test("q73 chunks reassemble losslessly to the original document") {
    val rebuilt = run("q73_chunk_windows")
      .join(graft.Tables.load(spark, sf, "documents").select("doc_id", "text"), "doc_id")
      .groupBy(col("doc_id"), col("text"))
      .agg(sum(col("n_tokens")).as("tok_sum"))
      .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
    assert(rebuilt.filter(col("tok_sum") =!= col("n_words")).count() === 0L,
      "chunk token counts must partition the document's tokens exactly")
  }

  test("q67 split fractions sit near the 5/10/85 contract") {
    val frac = run("q67_split_shards")
      .groupBy("split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = frac.values.sum.toDouble
    // 500 docs; binomial 3σ bounds
    assert(math.abs(frac.getOrElse("test", 0L) / n - 0.05) < 0.03, frac.toString)
    assert(math.abs(frac.getOrElse("val", 0L) / n - 0.10) < 0.05, frac.toString)
    assert(frac.getOrElse("train", 0L) / n > 0.75, frac.toString)
    // shards cover the full range and are balanced within reason
    val shards = run("q67_split_shards").select("shard_id").distinct().count()
    assert(shards === 16L, "all 16 shards must be hit")
  }

  test("q74 keep decision matches its own permyriad threshold exactly per source") {
    val rows = run("q74_corpus_mix")
      .groupBy("source", "keep_permyriad")
      .agg(count(lit(1)).as("n"), sum(when(col("kept"), 1L).otherwise(0L)).as("k"))
      .collect()
    rows.foreach { r =>
      val (thr, n, k) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (thr === 10000L) assert(k === n, s"threshold 10000 must keep all: $r")
      else {
        // hash-uniformity: kept rate within 4σ of thr/10000 for this n
        val p = thr / 10000.0
        val sd = math.sqrt(p * (1 - p) / n)
        assert(math.abs(k.toDouble / n - p) < 4 * sd + 0.02, s"keep rate off: $r")
      }
    }
    assert(rows.exists(_.getLong(1) < 10000L), "some source must be down-sampled")
  }

  test("q81 vocabulary ranks are a dense 1..k with nonincreasing frequencies") {
    val rows = run("q81_vocab_topk")
      .orderBy("rank").collect()
    assert(rows.length === 25)
    assert(rows.map(_.getLong(2)).toSeq === (1L to 25L))
    val freqs = rows.map(_.getLong(1))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      "frequencies must be nonincreasing down the rank order")
  }

  test("q115 winsorized means replay exactly from collected per-source data") {
    // Independent ground truth: collect the tiny sf0.001 corpus and
    // re-derive p05/p95 (linear-interpolated percentile over n-1 ranks,
    // the percentile()/quantile_cont definition), the clamped mean with
    // the same DECIMAL(18,4) quantization, and the clamp count.
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
    def pct(sorted: Array[Double], p: Double): Double = {
      val rank = p * (sorted.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
    }
    def dec4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val truth = docs.groupBy(_._1).map { case (src, xs) =>
      val v = xs.map(_._2).sorted
      val (p05, p95) = (pct(v, 0.05), pct(v, 0.95))
      val clamped = v.map(x => math.min(math.max(x, p05), p95))
      src -> ((v.length.toLong, p05, p95,
        (v.map(dec4).sum / v.length).toDouble,
        (clamped.map(dec4).sum / v.length).toDouble,
        v.count(x => x < p05 || x > p95).toLong))
    }
    val got = run("q115_winsorize").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    }.toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (src, (n, p05, p95, mRaw, mWins, nCl)) =>
      val g = got(src)
      assert(g._1 === n, s"$src n")
      assert(math.abs(g._2 - p05) < 1e-9, s"$src p05: ${g._2} vs $p05")
      assert(math.abs(g._3 - p95) < 1e-9, s"$src p95: ${g._3} vs $p95")
      assert(math.abs(g._4 - mRaw) < 1e-9, s"$src mean_raw: ${g._4} vs $mRaw")
      assert(math.abs(g._5 - mWins) < 1e-9, s"$src mean_wins: ${g._5} vs $mWins")
      assert(g._6 === nCl, s"$src n_clamped")
    }
  }

  test("q117 median/MAD and outlier flags replay exactly from collected data") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
    def median(v: Array[Double]): Double = {
      val s = v.sorted
      val rank = 0.5 * (s.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      s(lo) + (rank - lo) * (s(hi) - s(lo))
    }
    val truth = docs.groupBy(_._1).map { case (src, xs) =>
      val v = xs.map(_._2)
      val med = median(v)
      val mad = median(v.map(x => math.abs(x - med)))
      src -> ((med, mad, v.length.toLong,
        v.count(x => math.abs(x - med) > 3 * 1.4826 * mad).toLong))
    }
    val got = run("q117_mad_outliers").collect().map { r =>
      r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (src, (med, mad, n, nOut)) =>
      val g = got(src)
      assert(math.abs(g._1 - med) < 1e-9, s"$src med: ${g._1} vs $med")
      assert(math.abs(g._2 - mad) < 1e-9, s"$src mad: ${g._2} vs $mad")
      assert(g._3 === n && g._4 === nOut, s"$src n/outliers: $g vs ($n, $nOut)")
    }
  }

  test("q82 packing is gapless: each shard's placements tile the token stream") {
    val byShard = run("q82_greedy_pack")
      .groupBy("shard")
      .agg(sum("n_tokens").as("total"),
        max(col("pack_id") * 1024 + col("off") + col("n_tokens")).as("end"),
        min(col("pack_id") * 1024 + col("off")).as("start"),
        count(lit(1)).as("n"))
    // exclusive prefix sums tile [0, total) exactly: first doc at 0,
    // last doc ends at the shard's token total — no gaps, no overlaps
    assert(byShard.filter(col("start") =!= 0L || col("end") =!= col("total"))
      .count() === 0L)
  }

  test("q194 equivalence classes partition the customer table; suppression matches k") {
    val rows = run("q194_k_anonymity").collect()
    val total = graft.Tables.load(spark, sf, "customer").count()
    assert(rows.map(_.getLong(3)).sum === total,
      "class sizes must partition every customer row exactly once")
    rows.foreach { r =>
      val (size, meets, risk, supp) =
        (r.getLong(3), r.getBoolean(4), r.getLong(5), r.getLong(6))
      assert(meets === (size >= 5))
      assert(risk === 1000000L / size)
      assert(supp === (if (size >= 5) 0L else size),
        "a failing class suppresses all of its rows")
    }
  }

  test("q199 KS distance matches a driver-side exact recompute per source") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val nAll = docs.length.toLong
    val allSorted = docs.map(_._2).sorted
    def cdfCount(vals: Array[Long], x: Long): Long = vals.count(_ <= x).toLong
    val grid = docs.map(_._2).distinct.sorted
    val expect = docs.groupBy(_._1).map { case (src, rows) =>
      val vs = rows.map(_._2).sorted
      val nS = vs.length.toLong
      val ks = grid.map { x =>
        math.abs(cdfCount(vs, x) * nAll - cdfCount(allSorted, x) * nS) *
          1000000L / (nS * nAll)
      }.max
      src -> ks
    }
    val got = run("q199_ks_drift").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === expect, s"per-source KS ppm mismatch")
  }
}
