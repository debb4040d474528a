package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-Scala replays and invariants for the round-9 additions
  * (q271–q277) — each backed by a DuckDB oracle in CORRECTNESS; these
  * pin the SEMANTICS against independent replays the way
  * StatsEvalSpec does for the stats family. */
class Round9Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)

  test("q271/q272: the real parsers recover exactly what the real writers encoded") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val probes = run("q271_container_roundtrip").collect()
    assert(probes.length === docs.size, "every document probes")
    probes.foreach { r =>
      val (id, container) = (r.getLong(0), r.getString(1))
      if (id % 2 == 0) {
        assert(container === "wav")
        assert(r.getLong(2) === 8000 + (id % 4) * 4000, "sample rate")
        assert(r.getLong(7) === (docs(id).length + 255) / 256, "frames")
      } else {
        assert(container === "bmp")
        assert(r.getLong(5) === 1 + id % 16, "width")
        assert(r.getLong(6) === 1 + id % 9, "height")
      }
    }
    // q272: total energy replays from the character codes (8-bit PCM
    // decode: sample = byte − 128)
    val e = run("q272_wav_energy_roundtrip").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    docs.foreach { case (id, text) =>
      val want = text.map(c => { val s = c.toLong - 128; s * s }).sum
      assert(e(id) === want, s"doc $id energy")
    }
  }

  test("q273: magnitude bins conserve the degree mass and shares are sane") {
    val rows = run("q273_degree_profile").collect()
    val pairs = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
    val nEdges = pairs.count()
    val nCust = pairs.select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nCust, "customers partition")
    assert(rows.map(_.getLong(4)).sum === nEdges, "edge mass conserves")
    rows.foreach { r =>
      val (mag, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn.toString.length.toLong === mag
        && mx.toString.length.toLong === mag, "bin = digit count")
      assert(r.getLong(5) <= 1000L && r.getLong(6) <= 1000L)
    }
  }

  test("q274: RRF fuses the two oracle-backed lists with exact reciprocal weights") {
    val fused = run("q274_rank_fusion").collect()
    // 20 queries × top-5
    assert(fused.length === 100)
    fused.foreach { r =>
      val (rrf, nLists, rank) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nLists >= 1 && nLists <= 2)
      // a candidate on both lists carries two reciprocal terms; the
      // extremes are rank 1 on both (2·10⁶/61) and rank 5 on one
      assert(rrf >= 1000000L / 65 && rrf <= 2 * (1000000L / 61))
      assert(rank >= 1 && rank <= 5)
    }
    // a candidate on BOTH lists at any ranks beats one on a single
    // list at the worst rank — check per query that n_lists=2 rows
    // never score below the single-list floor
    fused.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val both = rs.filter(_.getLong(3) == 2).map(_.getLong(2))
      both.foreach(s => assert(s >= 2 * (1000000L / 65)))
    }
  }

  test("q275: Mann-Kendall S replays pairwise from the collected daily series") {
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(cast(value as decimal(18,4)) * 100 as bigint)"))
        .as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = run("q275_mann_kendall").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      var s = 0L
      for (i <- xs.indices; j <- i + 1 until xs.length)
        s += java.lang.Long.signum(xs(j) - xs(i))
      val (gn, gs, gv, gd) = got(tpe)
      assert(gn === n && gs === s, s"$tpe S statistic")
      assert(gv === n * (n - 1) * (2 * n + 5), s"$tpe variance numerator")
      assert(gd === (if (s > 0) "up" else if (s < 0) "down" else "flat"))
    }
  }

  test("q276: Chao1 dominates observed vocabulary; coverage bounded") {
    val rows = run("q276_chao1_richness").collect()
    rows.foreach { r =>
      val (v, f1, f2, chao, cov) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(f1 + f2 <= v)
      assert(chao >= 1000 * v, "estimator never below observed")
      assert(chao === 1000 * v + (1000 * f1 * (f1 - 1)) / (2 * (f2 + 1)))
      assert(cov >= 1 && cov <= 1000000L, "coverage is a proper share")
    }
  }

  test("q278: Hamilton seats sum to exactly the budget; quotas replay in BigInt") {
    val rows = run("q278_neyman_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._4).sum === 10000L,
      "largest-remainder apportionment must conserve the budget exactly")
    rows.foreach { case (_, _, _, alloc, base, rem) =>
      assert(alloc === base || alloc === base + 1, "at most one bonus seat")
      assert(rem >= 0 && rem < 1000000L)
    }
    // replay the quota split: Σ floor quotas + #bonus seats = budget,
    // and bonus seats go to the LARGEST remainders (ties by source)
    val leftover = 10000L - rows.map(_._5).sum
    val bonus = rows.filter(r => r._4 == r._5 + 1)
    assert(bonus.length.toLong === leftover)
    val cut = rows.sortBy(r => (-r._6, r._1)).take(leftover.toInt)
      .map(_._1).toSet
    assert(bonus.map(_._1).toSet === cut, "bonus = top remainders")
  }

  test("q279: runs count replays from the collected daily sign sequence") {
    val daily = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(cast(value as decimal(18,4)) * 100 as bigint)"))
        .as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val got = run("q279_runs_test").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val ups = xs.map(x => if (n * x > sx) 1L else 0L)
      val runs = 1L + ups.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      val nA = ups.sum
      val (gn, ga, gb, gr, gm, gvn, gvd) = got(tpe)
      assert(gn === n && ga === nA && gb === n - nA && gr === runs, tpe)
      assert(gm === 1000L + 2000L * nA * (n - nA) / n, s"$tpe expected runs")
      assert(gvn === 2 * nA * (n - nA) * (2 * nA * (n - nA) - n))
      assert(gvd === n * n * (n - 1))
    }
  }

  test("q280: centroid cosine is bounded and the floor-mean vectors replay in BigInt") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("label"),
        expr("transform(embedding, x -> cast(floor(cast(x as double)" +
          " * 1000) as bigint))").as("qv"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
    val dim = vecs.head._2.length
    def mean(rows: Seq[Array[Long]]): Array[Long] =
      Array.tabulate(dim)(i =>
        (rows.map(r => BigInt(r(i))).sum / rows.length).toLong)
    val global = mean(vecs.map(_._2).toSeq)
    val got = run("q280_label_centroid_drift").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    vecs.groupBy(_._1).foreach { case (label, rows) =>
      val mv = mean(rows.map(_._2).toSeq)
      val dot = mv.zip(global).map { case (a, b) => a * b }.sum
      val (n, gdot, cos) = got(label)
      assert(n === rows.length.toLong && gdot === dot, s"$label dot")
      assert(cos >= -1.0001 && cos <= 1.0001, s"$label cosine bound")
    }
  }

  test("q281: vocabulary growth is monotone and V(25) is the full source vocabulary") {
    val rows = run("q281_heaps_curve").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val byK = rs.sortBy(_._2)
      // V and token counts only grow with the checkpoint
      assert(byK.map(_._3) === byK.map(_._3).sorted, s"$src V monotone")
      assert(byK.map(_._4) === byK.map(_._4).sorted, s"$src tokens monotone")
    }
    // at sf0.001 every source has exactly 25 docs: V(25) = |vocab|
    val vocab = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").select("source", "tok").distinct()
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.filter(_._2 == 25L).foreach { case (src, _, v, _) =>
      assert(v === vocab(src), s"$src full vocabulary at k=25")
    }
  }

  test("q282: exact length bands replay from sorted per-source lengths") {
    val lens = graft.Tables.load(spark, sf, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = run("q282_length_bands").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    lens.groupBy(_._1).foreach { case (src, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length.toLong
      def pct(p: Long): Long = xs(((p * n + 99) / 100 - 1).toInt)
      val (gn, p10, p50, p90, band) = got(src)
      assert(gn === n)
      assert((p10, p50, p90) === ((pct(10), pct(50), pct(90))), src)
      assert(band === p90 - p10 && p10 <= p50 && p50 <= p90)
    }
  }

  test("q283: interleave audit conserves docs and the run algebra holds") {
    val rows = run("q283_interleave_audit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._2).sum === nDocs, "shards partition the corpus")
    rows.foreach { case (shard, n, runs, maxRun, meanMilli) =>
      assert(shard >= 0 && shard < 32)
      assert(runs >= 1 && runs <= n)
      assert(maxRun >= 1 && maxRun <= n)
      assert(maxRun * runs >= n, "max run bounds the packing")
      assert(meanMilli === 1000L * n / runs)
    }
  }

  test("q277: scrub report replays from a driver-side regex pass") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val re = "\\b(customer|key|slow)\\b".r
    val truth = docs.groupBy(_._1).map { case (src, rows) =>
      val hits = rows.map(r => re.findAllIn(r._2).toSeq)
      src -> ((rows.length.toLong, hits.count(_.nonEmpty).toLong,
        hits.map(_.length.toLong).sum, hits.flatten.map(_.length.toLong).sum))
    }
    val got = run("q277_blocklist_scrub").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === truth)
  }
}
