package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantic properties of the round's analytics queries (q89–q96) that
  * an oracle hash match alone cannot express: independent in-Scala
  * recomputation of PageRank and the BPE pair counts, cover/canonical
  * invariants of semantic dedup, funnel monotonicity, spine
  * gaplessness, and the quantile sketch's rank-error contract against
  * the exact percentile. */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ----------------------------------------------------------- q89
  test("q89 covers partition the vectors: dup_of is an earlier same-cell vector, kept iff none") {
    val rows = run("q89_semantic_dedup").collect()
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every vector exactly once
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val (id, kept) = (r.getLong(0), r.getBoolean(3))
      if (r.isNullAt(2)) assert(kept, s"$id has no cover but kept=false")
      else {
        val dupOf = r.getLong(2)
        assert(!kept, s"$id has cover $dupOf but kept=true")
        assert(dupOf < id, s"canonical $dupOf must precede $id")
        assert(cellOf(dupOf) === cellOf(id),
          s"cover $dupOf of $id crosses cells — blocking broke")
      }
    }
  }

  test("q89 equals the brute-force within-cell min cover") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val withN = vecs.map { case (id, qv) =>
      (id, qv, qv.map(x => x * x).sum)
    }.filter(_._3 > 0)
    val byCell = run("q89_semantic_dedup").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = withN.map { case (id, qv, qn) =>
      val covers = withN.filter { case (id2, qv2, qn2) =>
        id2 < id && byCell(id2) == byCell(id) && {
          val dot = qv.zip(qv2).map { case (x, y) => x * y }.sum
          dot.toDouble / math.sqrt(qn.toDouble * qn2.toDouble) >= 0.30
        }
      }
      id -> (if (covers.isEmpty) None else Some(covers.map(_._1).min))
    }.toMap
    val got = run("q89_semantic_dedup").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got === expect)
  }

  // ----------------------------------------------------------- q90
  test("q90 ranks are dense, scores non-increasing, hits contain a query term") {
    val rows = run("q90_bm25")
      .orderBy("query_id", "rnk").collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getLong(3)).sorted
      assert(ranks.toSeq === (1L to ranks.length).toSeq, "ranks must be dense from 1")
      val byRank = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "score must not increase with rank")
    }
    // every hit really contains one of its query's bigrams
    val terms = Map(1 -> Seq("hash join", "merge join"),
      2 -> Seq("stream batch", "batch window"), 3 -> Seq("vector scan"))
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (qid, doc) = (r.getInt(0), r.getLong(1))
      assert(terms(qid).exists(texts(doc).contains(_)),
        s"doc $doc ranked for query $qid without containing any query term")
    }
  }

  // ----------------------------------------------------------- q91
  test("q91 offset-0 equals cohort size, retention never exceeds it, cohorts cover all users") {
    val rows = run("q91_cohort_retention").collect()
    rows.foreach { r =>
      val (off, n, size) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (off == 0L) assert(n === size, "offset 0 must equal cohort_size")
      assert(n <= size, "retained users cannot exceed the cohort")
      assert(off >= 0L, "activity cannot precede the first event's week")
    }
    val totalUsers = graft.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    val cohortSum = rows.filter(_.getLong(1) == 0L).map(_.getLong(3)).sum
    assert(cohortSum === totalUsers, "cohorts at offset 0 must partition the users")
  }

  // ----------------------------------------------------------- q92
  test("q92 funnel counts are monotone non-increasing and stage 1 is the view-user count") {
    val rows = run("q92_funnel").orderBy("step").collect()
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must narrow: ${counts.mkString(",")}")
    val viewUsers = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "view").select("user_id").distinct().count()
    assert(counts.head === viewUsers)
    assert(rows.head.getLong(3) === 0L, "stage 1 has no advance lag")
  }

  // ----------------------------------------------------------- q93
  test("q93 spine is gapless per key, non-gap rows mirror the hourly table, fill is total") {
    val out = run("q93_gapfill")
    val spans = out.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        min("hour_bucket").as("h0"), max("hour_bucket").as("h1"))
      .withColumn("expect",
        (unix_micros(col("h1")) - unix_micros(col("h0"))) / 3600000000L + 1)
    assert(spans.filter(col("rows") =!= col("expect")).count() === 0L,
      "every hour between a key's first and last must appear exactly once")
    val nonGap = out.filter(col("is_gap") === 0).count()
    val hourly = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"), date_trunc("hour", col("ts"))).distinct().count()
    assert(nonGap === hourly, "non-gap rows must be exactly the observed hours")
    // first spine row per key is observed (min comes from the data), so
    // the forward fill is total: no NULL filled_sum anywhere
    assert(out.filter(col("filled_sum").isNull).count() === 0L)
  }

  // ----------------------------------------------------------- q94
  test("q94 equals an independent in-Scala fixed-point PageRank replay") {
    val pairs = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), -(r.getLong(1) + 1)))
    val edges = pairs ++ pairs.map { case (c, s) => (s, c) }
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = outdeg.keys.map(_ -> 10000L).toMap
    (1 to 3).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => rank(src) / outdeg(src) }.sum).toMap
      rank = in.map { case (n, s) => n -> (1500L + (85L * s) / 100L) }
    }
    val got = run("q94_pagerank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === rank)
  }

  // ----------------------------------------------------------- q104
  test("q104 equals an in-Scala bounded-BFS walk enumeration") {
    val pairs = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), -(r.getLong(1) + 1)))
    val adj = (pairs ++ pairs.map { case (c, s) => (s, c) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val walks = scala.collection.mutable.Map((1L, 0L) -> 1L)
    var frontier = Seq((1L, 1L)) // (node, multiplicity) at current depth
    for (depth <- 1L to 2L) {
      val next = frontier.flatMap { case (n, m) =>
        adj.getOrElse(n, Seq.empty[Long]).map(_ -> m)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      next.foreach { case (n, m) =>
        walks((n, depth)) = walks.getOrElse((n, depth), 0L) + m
      }
      frontier = next
    }
    val expect = walks.toSeq.groupBy(_._1._1).map { case (n, ws) =>
      n -> (ws.map(_._1._2).min, ws.map(_._2).sum)
    }
    val got = run("q104_recursive_bfs").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expect)
  }

  // ----------------------------------------------------------- q95
  test("q95 equals an independent in-Scala BPE pair count replay") {
    val pat = java.util.regex.Pattern.compile(
      """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+""")
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0)).filter(_.nonEmpty)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val m = pat.matcher(t)
      while (m.find()) {
        val tok = m.group()
        var i = 0
        while (i < tok.length - 1) {
          val p = tok.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
          i += 1
        }
      }
    }
    val expect = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = run("q95_bpe_merge").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got === expect)
  }

  // ----------------------------------------------------------- q97
  test("q97 transition rows normalize to 1 and transitions count events minus users") {
    val rows = run("q97_event_transitions").collect()
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"$from row sums to $pSum")
    }
    val ev = graft.Tables.load(spark, sf, "events")
    val expectTransitions = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expectTransitions,
      "every consecutive pair in every user's timeline is exactly one transition")
  }

  // ----------------------------------------------------------- q98
  test("q98 equals the k smallest hash/weight priorities replayed in Scala") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0)
    val expect = docs.map { case (id, w) =>
      val h = ((id + 15485863L) * 2654435761L) % 4294967296L
      (id, h.toDouble / w.toDouble)
    }.sortBy { case (id, p) => (p, id) }.take(100).map(_._1).toSeq
    val got = run("q98_priority_sample").orderBy("rnk").collect().map(_.getLong(0)).toSeq
    assert(got === expect)
  }

  // ----------------------------------------------------------- q100
  test("q100 cube conserves mass across all four grouping levels") {
    val rows = run("q100_cube").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val leaf = rows.filter(r => r._1 != "?" && r._2 != "?").map(_._3).sum
    val byStatus = rows.filter(r => r._1 != "?" && r._2 == "?").map(_._3).sum
    val byPrio = rows.filter(r => r._1 == "?" && r._2 != "?").map(_._3).sum
    val grand = rows.filter(r => r._1 == "?" && r._2 == "?").map(_._3)
    assert(grand.length === 1 && grand.head === leaf)
    assert(byStatus === leaf && byPrio === leaf,
      "every grouping level must re-aggregate the same row mass")
  }

  // ----------------------------------------------------------- q101
  test("q101 unpivot emits one row per (flag, measure), values matching the wide agg") {
    val rows = run("q101_unpivot").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val flags = rows.keySet.map(_._1)
    assert(rows.size === flags.size * 3, "3 measures per flag")
    val wide = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(graft.Det.dsum(col("l_quantity")).as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    wide.foreach { case (f, v) => assert(rows((f, "qty")) === v) }
  }

  // ----------------------------------------------------------- q102
  test("q102 ratio functions agree with their rank definitions") {
    val byStatus = run("q102_rank_family").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .groupBy(_._1)
    byStatus.foreach { case (_, rs) =>
      val n = rs.length.toLong
      rs.foreach { case (_, rnk, drnk, prnk, cdist) =>
        assert(prnk === (if (n == 1) 0.0 else (rnk - 1).toDouble / (n - 1).toDouble))
        assert(drnk <= rnk)
        // cume_dist = fraction of rows with rank <= this row's peer group
        assert(cdist > 0.0 && cdist <= 1.0)
      }
    }
  }

  // ----------------------------------------------------------- q103
  test("q103 confusion matrix partitions the vectors and predicts within the label set") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
    val labels = vecs.select("label").distinct().collect().map(_.getInt(0)).toSet
    val rows = run("q103_centroid_classify").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.map(_._3).sum === vecs.count(),
      "every vector classifies exactly once (qn > 0 holds for all test vectors)")
    rows.foreach { case (l, p, _) =>
      assert(labels.contains(l) && labels.contains(p))
    }
    val acc = rows.filter(r => r._1 == r._2).map(_._3).sum.toDouble / rows.map(_._3).sum
    assert(acc > 1.0 / labels.size,
      s"nearest-centroid must beat the random baseline, got $acc")
  }

  // ----------------------------------------------------------- q105
  test("q105 islands tile each user's timeline: counts conserve, runs alternate, intervals order") {
    val rows = run("q105_scd2_islands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val ev = graft.Tables.load(spark, sf, "events")
    assert(rows.map(_._4).sum === ev.count(), "islands partition the events")
    rows.groupBy(_._1).foreach { case (_, runs) =>
      val ordered = runs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === (1L to ordered.length).toSeq, "dense run ids")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 != b._3, "consecutive islands must change state")
          assert(a._6 < b._5, "intervals must be disjoint and ordered")
        case _ =>
      }
      ordered.foreach(r => assert(r._5 <= r._6, "start <= end"))
    }
  }

  // ----------------------------------------------------------- q106
  test("q106 keeps 70%±bucket of the corpus and never keeps below the threshold") {
    val rows = run("q106_quality_cut").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val kept = rows.map(_._3).sum
    assert(rows.map(_._4).distinct.length === 1, "one global threshold")
    // the cut drops AT LEAST 30% (boundary bucket kept-side is dropped
    // entirely by the strictly-above rule) and at most 30% + one
    // bucket's population
    assert(kept <= (total * 7000 + 9999) / 10000, s"kept $kept of $total")
    assert(kept >= total / 2, "the cut must not collapse the corpus")
  }

  // ----------------------------------------------------------- q107
  test("q107 equals an in-Scala covariance replay; diagonal variances are non-negative") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length.toLong
    val got = run("q107_embedding_covariance").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.size === 64 * 65 / 2)
    for (i <- 0 until 64; j <- i until 64) {
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val (gSxy, gSxi, gSxj) = got((i + 1L, j + 1L))
      assert(gSxy === sxy && gSxi === vecs.map(_(i)).sum && gSxj === vecs.map(_(j)).sum)
      if (i == j) assert(n * sxy - gSxi * gSxj >= 0L, s"variance($i) negative")
    }
  }

  // ----------------------------------------------------------- q108
  test("q108 presence classes partition the union of id spaces") {
    val rows = run("q108_full_outer").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.map(_._1).distinct.length === rows.length, "one row per id")
    rows.foreach { case (_, no, ne, p) =>
      p match {
        case "both"        => assert(no > 0 && ne > 0)
        case "orders_only" => assert(no > 0 && ne === 0)
        case "events_only" => assert(no === 0 && ne > 0)
      }
    }
    val custs = graft.Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    val users = graft.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    val both = rows.count(_._4 == "both").toLong
    assert(rows.length.toLong === custs + users - both, "full outer covers the id union")
  }

  // ----------------------------------------------------------- q109
  test("q109 bag identity holds per month: |A except all B| + |A intersect all B| = |A|") {
    val rows = run("q109_multiset_setops").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val ship = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    ship.foreach { case (m, total) =>
      val ex = rows.collectFirst { case ("except_all", `m`, v) => v }.getOrElse(0L)
      val in = rows.collectFirst { case ("intersect_all", `m`, v) => v }.getOrElse(0L)
      assert(ex + in === total, s"month $m: $ex + $in != $total")
    }
  }

  // ----------------------------------------------------------- q110
  test("q110 equals a direct 3-sigma replay in double arithmetic") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val n = vecs.length
    val expect = vecs.map { case (id, qv) =>
      val cnt = (0 until 64).count { i =>
        val xs = vecs.map(_._2(i))
        val mean = xs.sum.toDouble / n
        val varr = xs.map(x => (x - mean) * (x - mean)).sum / n
        math.abs(qv(i) - mean) > 3 * math.sqrt(varr)
      }
      id -> cnt.toLong
    }.toMap
    val got = run("q110_outlier_dims").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the integer cross-multiplied inequality is EXACT; the double
    // replay can disagree only within floating error of the boundary,
    // which this data never sits on
    assert(got === expect)
  }

  // ----------------------------------------------------------- q112
  test("q112 checksum detects a one-row mutation and ignores row order") {
    val base = run("q112_table_checksum").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // order independence: recompute over a reshuffled frame
    val li = graft.Tables.load(spark, sf, "lineitem")
    def checksumOf(df: org.apache.spark.sql.DataFrame) = {
      val h = "md5(concat_ws('|', l_orderkey, l_linenumber, l_returnflag, CAST(l_shipdate AS STRING)))"
      val poly = (0 until 12).map { p =>
        s"(instr('0123456789abcdef', substr($h, ${12 - p}, 1)) - 1) * ${1L << (4 * p)}L"
      }.mkString(" + ")
      df.groupBy(col("l_returnflag"))
        .agg(expr(s"CAST(SUM(CAST($poly AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT)")
          .as("checksum"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val shuffled = checksumOf(li.repartition(7))
    base.foreach { case (k, (_, c)) => assert(shuffled(k) === c, s"order changed checksum for $k") }
    // sensitivity: flipping one l_linenumber changes exactly that flag's checksum
    val mutated = checksumOf(li.withColumn("l_linenumber",
      when(col("l_orderkey") === li.select(min("l_orderkey")).head.getLong(0),
        col("l_linenumber") + 1000).otherwise(col("l_linenumber"))))
    assert(mutated.exists { case (k, c) => base(k)._2 != c },
      "a mutated row must change some checksum")
  }

  // ----------------------------------------------------------- q96
  test("q96 histogram is mergeable: shard histograms sum cell-wise to the full build") {
    val li = graft.Tables.load(spark, sf, "lineitem")
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_returnflag"),
        floor(col("l_extendedprice") / 100).cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
    val full = hist(li).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // two disjoint shards (parity of the order key) built independently,
    // then merged by cell-wise addition — the distributed-build contract
    val even = hist(li.filter(col("l_orderkey") % 2 === 0)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val odd = hist(li.filter(col("l_orderkey") % 2 =!= 0)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))).toMap
    assert(merged === full)
  }

  test("q96 brackets the exact percentile and targets the ceil rank") {
    val prices = graft.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    run("q96_hist_quantile").collect().foreach { r =>
      val (flag, qp) = (r.getString(0), r.getInt(1))
      val (lo, hi) = (r.getLong(2), r.getLong(3))
      val (n, target) = (r.getLong(4), r.getLong(5))
      val sorted = prices(flag)
      assert(n === sorted.length.toLong)
      assert(target === (n * qp + 9999) / 10000)
      val exact = sorted(target.toInt - 1) // rank-target order statistic
      assert(exact >= lo && exact < hi,
        s"$flag p$qp: exact $exact outside [$lo, $hi)")
    }
  }

  test("q114 two-stage ANN: dense ranks and high recall vs exact q36 top-5") {
    val ann = run("q114_quantized_ann").cache()
    val perQ = ann.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"))
    assert(perQ.count() === 20L)
    assert(perQ.filter(col("n") =!= 5 || col("mx") =!= 5).count() === 0L)
    // recall against the exact brute-force answer (same query set):
    // the 50-candidate coarse stage must recover nearly all true top-5
    val exact = run("q36_cosine_topk").select("query_id", "vec_id")
    val hit = ann.select("query_id", "vec_id").intersect(exact).count()
    val total = exact.count()
    assert(hit >= (total * 9) / 10, s"recall $hit/$total below 0.9")
    ann.unpersist()
  }

  test("q118 CDC merge replays exactly from the collected event log") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3),
        r.getDouble(4)))
    def latest(half: Long) = ev.filter(_._1 % 2 == half).groupBy(_._3)
      .map { case (u, xs) => u -> xs.maxBy(e => (e._2, e._1)) }
    val base = latest(0); val chg = latest(1)
    val truth = (base.keySet ++ chg.keySet).map { u =>
      (base.get(u), chg.get(u)) match {
        case (Some(b), None) => (u, "kept", Option(b._5), Option.empty[Long])
        case (Some(_), Some(c)) if c._4 == "error" =>
          (u, "deleted", Option.empty[Double], Some(c._1))
        case (None, Some(c)) if c._4 == "error" =>
          (u, "noop_delete", Option.empty[Double], Some(c._1))
        case (None, Some(c)) => (u, "inserted", Option(c._5), Some(c._1))
        case (Some(_), Some(c)) => (u, "updated", Option(c._5), Some(c._1))
        case (None, None) => sys.error("unreachable")
      }
    }
    val got = run("q118_cdc_upsert").collect().map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2)),
        if (r.isNullAt(3)) Option.empty[Long] else Some(r.getLong(3)))
    }.toSet
    assert(got === truth, s"got ${got.size} vs truth ${truth.size}")
  }

  test("q119 normalized scores replay from a knot-grid interpolation in Scala") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def pct(sorted: Array[Double], p: Double): Double = {
      val rank = p * (sorted.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
    }
    val corpus = docs.map(_._3.toDouble).sorted
    val kn = (0 to 100).map(i => pct(corpus, i / 100.0)).toArray
    val truth = docs.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val ordered = xs.sortBy(d => (d._3, d._1))
      val n = ordered.length
      ordered.zipWithIndex.map { case (d, i) =>
        val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        val g = pr * 100.0
        val lo = math.min(math.floor(g), 99.0)
        val norm = kn(lo.toInt) + (g - lo) * (kn(lo.toInt + 1) - kn(lo.toInt))
        d._1 -> ((pr, norm))
      }
    }.toMap
    val got = run("q119_quantile_norm").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (id, (pr, norm)) =>
      assert(math.abs(got(id)._1 - pr) < 1e-12, s"doc $id pr")
      assert(math.abs(got(id)._2 - norm) < 1e-9, s"doc $id norm")
    }
  }

  test("q120 mines one positive and three ordered negatives with correct label roles") {
    val labels = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("q120_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 20)
    byQ.foreach { case (q, xs) =>
      val negs = xs.filter(_._3 == "neg").sortBy(_._4)
      val pos = xs.filter(_._3 == "pos")
      assert(negs.length === 3 && pos.length === 1, s"anchor $q: ${xs.length} rows")
      assert(pos.forall(p => labels(p._2) == labels(q)), s"anchor $q pos label")
      assert(negs.forall(n => labels(n._2) != labels(q)), s"anchor $q neg label")
      assert(negs.map(_._4).toSeq === Seq(1L, 2L, 3L), s"anchor $q neg ranks")
      val sc = negs.map(_._5)
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b }, s"anchor $q order")
    }
  }

  test("q121 two-phase skyline equals the brute-force dominance frontier") {
    val o = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // strict skyline with equal-point collapse to the smallest key
    val truth = o.filter { case (k, p, d) =>
      !o.exists { case (k2, p2, d2) =>
        (p2 > p && d2 <= d) || (p2 >= p && d2 < d) ||
          (p2 == p && d2 == d && k2 < k)
      }
    }.map(_._1).toSet
    val got = run("q121_skyline").collect().map(_.getLong(0)).toSet
    assert(got === truth, s"got $got vs $truth")
  }

  test("q122 temperature mix: rates flatten with size and spend ≈ the half-corpus budget") {
    val rows = run("q122_temperature_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // thr ∝ 1/√n: ordered by source size the threshold must be non-increasing
    val byN = rows.sortBy(_._2)
    byN.map(_._3).zip(byN.tail.map(_._3)).foreach { case (a, b) =>
      assert(a >= b, s"keep rate must not grow with source size: $byN")
    }
    // expected kept = Σ n·thr/10⁴ must sit just under the K = total/2 budget
    val total = rows.map(_._2).sum
    val expKept = rows.map(r => r._2 * r._3 / 10000.0).sum
    assert(expKept <= total / 2.0 + rows.length,
      s"budget overrun: $expKept vs ${total / 2.0}")
    assert(expKept >= total * 0.45, s"budget underspend: $expKept vs ${total / 2.0}")
    // realized keeps track the threshold binomially (q74's uniformity bound)
    rows.foreach { case (src, n, thr, kept) =>
      val p = thr / 10000.0
      val sd = math.sqrt(p * (1 - p) / n)
      assert(math.abs(kept.toDouble / n - p) < 4 * sd + 0.02,
        s"$src keep rate off: $kept/$n vs $p")
    }
  }

  test("q123 triangle census equals a brute-force projection replay") {
    val orders = graft.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey").collect()
      .flatMap(r => orders.get(r.getLong(0)).map(c => (c, r.getLong(1)))).toSet
    val keepc = pairs.groupBy(_._1).filter(_._2.size <= 20).keySet
    val kp = pairs.filter(p => keepc(p._1))
    val bySupp = kp.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val nodes = bySupp.keySet
    val edges = (for {
      (c, s1) <- kp; (c2, s2) <- kp if c2 == c && s1 < s2
    } yield (s1, s2)).toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val wedges = (for {
      (u, v) <- edges; w <- adj.getOrElse(v, Set.empty)
    } yield (u, v, w)).toSet
    val tris = wedges.filter { case (u, _, w) => edges((u, w)) }
    val got = run("q123_triangle_census").collect().head
    assert(got.getLong(0) === nodes.size.toLong, "n_nodes")
    assert(got.getLong(1) === edges.size.toLong, "n_edges")
    assert(got.getLong(2) === wedges.size.toLong, "n_wedges")
    assert(got.getLong(3) === tris.size.toLong, "n_triangles")
    assert(math.abs(got.getDouble(4) - tris.size.toDouble / wedges.size) < 1e-12)
  }

  test("q124 index insert: batch coverage, threshold consistency, matches stay in-cell") {
    val rows = run("q124_index_insert").collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) Option.empty[Long] else Some(r.getLong(3)),
        if (r.isNullAt(4)) Option.empty[Double] else Some(r.getDouble(4)))
    }
    val nBatch = graft.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 === 0).count()
    // q124 drops zero-norm vectors before screening; none exist here
    assert(rows.length.toLong === nBatch, "every batch vector gets a decision")
    assert(rows.map(_._1).distinct.length === rows.length, "one decision per vector")
    rows.foreach { case (id, cell, action, m, s) =>
      assert(id % 10 === 0, s"$id is not a batch vector")
      (action, s) match {
        case ("reject_dup", Some(sc)) => assert(sc >= 0.30, s"$id rejected below threshold")
        case ("insert", Some(sc)) => assert(sc < 0.30, s"$id inserted above threshold")
        case ("insert", None) => // empty cell — fine
        case other => fail(s"$id inconsistent action/score: $other")
      }
      m.foreach(mid => assert(mid % 10 !== 0, s"$id matched a batch vector $mid"))
    }
    assert(rows.exists(_._3 == "reject_dup") && rows.exists(_._3 == "insert"),
      "both outcomes must occur on this corpus")
  }

  test("q125 overlap matrix replays exactly from collected token sets") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty).toSet).toMap
    val srcs = vocab.keys.toSeq.sorted
    val truth = (for {
      a <- srcs; b <- srcs if a < b
      common = (vocab(a) & vocab(b)).size.toLong if common > 0
    } yield (a, b) -> ((vocab(a).size.toLong, vocab(b).size.toLong, common,
      common.toDouble / (vocab(a).size + vocab(b).size - common)))).toMap
    val got = run("q125_source_overlap").collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    }.toMap
    assert(got.keySet === truth.keySet, "pair coverage")
    truth.foreach { case (k, (na, nb, c, j)) =>
      val g = got(k)
      assert(g._1 === na && g._2 === nb && g._3 === c, s"$k counts: $g")
      assert(math.abs(g._4 - j) < 1e-12, s"$k jaccard")
    }
  }

  test("q126 motif top-15 replays from per-user ordered trigram counting") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val counts = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val types = xs.sortBy(e => (e._3, e._4)).map(_._2)
      types.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.groupBy(identity).map { case (m, v) => m -> v.length.toLong }
    val truth = counts.toSeq.sortBy { case (m, n) => (-n, m) }.take(15)
    val got = run("q126_motif_mining").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === truth, s"got $got vs $truth")
  }

  test("q127 drift top-20 replays from two-sample token counts") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.flatMap { case (id, text) =>
      text.split(" ", -1).filter(_.nonEmpty).map(tok => (tok, id % 2))
    }.groupBy(_._1).map { case (tok, xs) =>
      (tok, xs.count(_._2 == 0).toLong, xs.count(_._2 == 1).toLong)
    }.toSeq
    val n1 = counts.map(_._2).sum
    val n2 = counts.map(_._3).sum
    val truth = counts.map { case (tok, c1, c2) =>
      val d = (c1 * n2 - c2 * n1).toDouble
      (tok, c1, c2, d * d / (n1 * n2).toDouble / (c1 + c2).toDouble)
    }.sortBy { case (tok, _, _, drift) => (-drift, tok) }.take(20)
    val got = run("q127_token_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) === truth.map(t => (t._1, t._2, t._3)))
    got.zip(truth).foreach { case (g, tr) =>
      assert(math.abs(g._4 - tr._4) < 1e-9, s"${g._1} drift")
    }
  }

  test("q128 interpolation replays from collected hourly averages") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("h"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def dec4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val hourUs = 3600L * 1000000L
    val obs = ev.groupBy(e => (e._1, e._2)).map { case (k, xs) =>
      k -> (xs.map(x => dec4(x._3)).sum.toDouble / xs.length)
    }
    val truth = obs.keys.groupBy(_._1).flatMap { case (tpe, ks) =>
      val hs = ks.map(_._2)
      val (h0, h1) = (hs.min, hs.max)
      (h0 to h1 by hourUs).map { h =>
        obs.get((tpe, h)) match {
          case Some(v) => (tpe, h) -> ((0, Option(v)))
          case None =>
            val prev = hs.filter(_ < h) match { case e if e.isEmpty => None; case e => Some(e.max) }
            val next = hs.filter(_ > h) match { case e if e.isEmpty => None; case e => Some(e.min) }
            val v = for (p <- prev; n <- next) yield {
              val (pv, nv) = (obs((tpe, p)), obs((tpe, n)))
              pv + (nv - pv) * ((h - p).toDouble / (n - p).toDouble)
            }
            (tpe, h) -> ((1, v))
        }
      }
    }
    val got = run("q128_interpolate").collect().map { r =>
      (r.getString(0), r.getTimestamp(1).getTime * 1000L) ->
        ((r.getInt(2), if (r.isNullAt(3)) Option.empty[Double] else Some(r.getDouble(3))))
    }.toMap
    assert(got.keySet === truth.keySet, "spine coverage")
    truth.foreach { case (k, (flag, v)) =>
      assert(got(k)._1 === flag, s"$k gap flag")
      (got(k)._2, v) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$k: $a vs $b")
        case (a, b) => assert(a === b, s"$k nullness: $a vs $b")
      }
    }
  }

  test("q129 rebalance plan conserves mass and flags movement correctly") {
    val rows = run("q129_rebalance_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(rows.map(_._4).sum === docs.count(), "every doc appears once")
    assert(rows.map(_._5).sum ===
      docs.agg(sum("n_chars")).head().getLong(0), "bytes conserved")
    rows.foreach { case (o, n, stays, _, _) =>
      assert(stays === (o == n), s"stays flag wrong for ($o, $n)")
    }
    val moved = rows.filter(!_._3).map(_._4).sum.toDouble / rows.map(_._4).sum
    assert(moved > 0.75 && moved < 1.0,
      s"mod-rehash must move ~1-1/20 of rows, moved $moved")
  }

  test("q130 anomaly flags replay from trailing-window integer stats") {
    val hourly = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("h"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = hourly.groupBy(_._1).toSeq.flatMap { case (tpe, xs) =>
      val sorted = xs.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, h, x), i) =>
        val base = sorted.slice(math.max(0, i - 24), i).map(_._3)
        val n = base.length.toLong
        val flag: Option[Int] =
          if (n < 12) None
          else {
            val sx = base.sum; val sxx = base.map(v => v * v).sum
            val d = x * n - sx
            Some(if (d * d > 9 * (n * sxx - sx * sx)) 1 else 0)
          }
        (tpe, h) -> ((x, n, flag))
      }
    }.toMap
    val got = run("q130_rate_anomaly").collect().map { r =>
      (r.getString(0), r.getTimestamp(1).getTime * 1000L) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(5)) Option.empty[Int] else Some(r.getInt(5))))
    }.toMap
    assert(got === truth)
    assert(got.values.exists(_._3.contains(1)), "corpus must contain an anomaly")
  }

  test("q131 skew report replays from collected key frequencies") {
    val freqs = graft.Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("f"))
      .collect().map(_.getLong(1)).sorted
    def pct(p: Double): Double = {
      val rank = p * (freqs.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      freqs(lo) + (rank - lo) * (freqs(hi) - freqs(lo)).toDouble
    }
    val (nKeys, nRows) = (freqs.length.toLong, freqs.sum)
    val r = run("q131_skew_report").collect().head
    assert(r.getLong(0) === nKeys && r.getLong(1) === nRows)
    assert(r.getLong(2) === freqs.max)
    assert(math.abs(r.getDouble(3) - pct(0.5)) < 1e-9, "p50")
    assert(math.abs(r.getDouble(4) - pct(0.99)) < 1e-9, "p99")
    assert(math.abs(r.getDouble(5) - freqs.max.toDouble / nRows) < 1e-12)
    assert(r.getLong(6) === freqs.count(f => f * nKeys > 4 * nRows).toLong)
  }

  test("q132 signature clustering replays and always groups exact duplicates") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    // CODE-POINT indexed, like the kernel, the Spark HOF, and the
    // DuckDB oracle (substr/ascii are code-point semantics): a
    // charAt/length (UTF-16 unit) replay diverges on astral text
    def signature(text: String): String = {
      val cps = text.codePoints().toArray
      val n = cps.length
      val cls = (0 to 63).map { i =>
        val pos = ((i.toLong * n) / 64).toInt // i, n >= 0: div == floorDiv
        math.min(cps(pos) / 32, 7)
      }
      (0 to 7).map(b => cls.count(_ == b) / 8).mkString("-")
    }
    val clusters = docs.groupBy(d => signature(d._2)).filter(_._2.length > 1)
    val truth = clusters.map { case (sig, xs) =>
      sig -> ((xs.length.toLong, xs.map(_._2).distinct.length.toLong, xs.map(_._1).min))
    }
    val got = run("q132_payload_sig_dedup").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === truth)
    // exact duplicates must always land in one cluster
    val dupTexts = docs.groupBy(_._2).filter(_._2.length > 1)
    dupTexts.foreach { case (text, xs) =>
      assert(got.contains(signature(text)),
        s"exact duplicate group of ${xs.length} must cluster")
    }
    assert(got.nonEmpty, "corpus must produce at least one signature cluster")
    // astral (non-BMP) text: the sf corpora are BMP-only, so pin the
    // code-point contract directly against the kernel — surrogate
    // pairs count as ONE sampled position, and the ≥224 clamp folds
    // astral code points into class 7
    val astral = "a😀b🔥c" // a😀b🔥c — 5 code points
    val pk = graft.functions.PayloadSigKernel.packedSig(
      org.apache.spark.unsafe.types.UTF8String.fromString(astral))
    val cpsA = astral.codePoints().toArray
    val expectedPk = (0 to 63).map { i =>
      1L << (7 * math.min(cpsA(((i.toLong * cpsA.length) / 64).toInt) / 32, 7))
    }.sum
    assert(pk === expectedPk, "kernel must sample astral text by code point")
  }

  test("q133 collocation top-20 replays from bigram/unigram counts") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val tks = docs.map(_.split(" ", -1)).filter(_.length >= 2)
    val bigrams = tks.flatMap(tk => tk.sliding(2).map(p => p(0) + " " + p(1)))
      .groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    val thr = math.max(5L, bigrams.values.sum / 5000L)
    val uni = tks.flatten.filter(_.nonEmpty)
      .groupBy(identity).map { case (w, v) => w -> v.length.toLong }
    val n = uni.values.sum
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val truth = bigrams.filter(_._2 >= thr).toSeq.flatMap { case (pair, cxy) =>
      val Array(x, y) = pair.split(" ", -1)
      for (cx <- uni.get(x); cy <- uni.get(y))
        yield (pair, cxy, cx, cy, bitlen(cxy * n) - bitlen(cx * cy))
    }.sortBy { case (p, _, _, _, q) => (-q, p) }.take(20)
    val got = run("q133_collocations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === truth, s"got $got\nvs $truth")
  }

  test("q134 Benford audit: digit coverage, mass conservation, exact deviation replay") {
    val prices = graft.Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") >= 1)
      .select(round(col("o_totalprice")).cast("long")).collect().map(_.getLong(0))
    val obs = prices.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val n = obs.values.sum
    val expPpm = (1 to 9).map(d =>
      d.toLong -> math.round(math.log10(1.0 + 1.0 / d) * 1000000)).toMap
    val got = run("q134_benford_audit").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got.keySet === obs.keySet)
    assert(got.values.map(_._1).sum === n, "mass conserved")
    obs.foreach { case (d, o) =>
      val g = got(d)
      assert(g._1 === o && g._2 === expPpm(d), s"digit $d counts")
      val diff = (o * 1000000L - n * expPpm(d)) / 1000L
      assert(g._4 === diff * diff / (n * expPpm(d) / 1000L), s"digit $d dev")
      assert(math.abs(g._3 - o.toDouble / n) < 1e-12, s"digit $d share")
    }
  }

  test("q135 fertility ratios replay from the same regex in plain Scala") {
    val pat = graft.queries.TextOps.bpePattern.r
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).filter(_._2.nonEmpty)
    val truth = docs.groupBy(_._1).map { case (lang, xs) =>
      val nc = xs.map(_._2.length.toLong).sum
      val nb = xs.map(d => pat.findAllIn(d._2).size.toLong).sum
      val nw = xs.map(d => d._2.split(" ", -1).length.toLong).sum
      lang -> ((xs.length.toLong, nc, nb, nw, nc.toDouble / nb, nb.toDouble / nw))
    }
    val got = run("q135_tokenizer_fertility").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    }.toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (lang, tr) =>
      val g = got(lang)
      assert(g._1 === tr._1 && g._2 === tr._2 && g._3 === tr._3 && g._4 === tr._4,
        s"$lang counts: $g vs $tr")
      assert(math.abs(g._5 - tr._5) < 1e-12 && math.abs(g._6 - tr._6) < 1e-12)
    }
  }

  test("q136 leakage matrix: fold bounds, diagonal clean, off-diagonal all leaking") {
    val rows = run("q136_split_leakage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lo, hi, n, leak) =>
      assert(lo >= 0 && hi <= 4 && lo <= hi, s"fold bounds: ($lo, $hi)")
      if (lo == hi) assert(leak === 0L, s"diagonal ($lo,$hi) must not leak")
      else assert(leak === n, s"off-diagonal ($lo,$hi) pairs all leak")
    }
    assert(rows.exists { case (lo, hi, _, leak) => lo != hi && leak > 0 },
      "a row-level split of this corpus must show leakage")
    // the distinct pair count is bounded by the per-group pair sum
    val cfg = graft.operators.MinHashLsh.Config(bands = 3, rowsPerBand = 2, universal = true)
    val banded = graft.operators.MinHashLsh.explodeBands(
      graft.Tables.load(spark, sf, "documents").select("doc_id", "text"), "text", cfg)
    val groupPairSum = graft.operators.MinHashLsh.candidateGroups(banded, "doc_id")
      .collect().map(r => { val n = r.getLong(2); n * (n - 1) / 2 }).sum
    assert(rows.map(_._3).sum <= groupPairSum,
      "distinct pairs cannot exceed the per-group pair sum")
  }

  test("q137 nested rollup replays from flat lineitem rows") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long"),
        round(col("l_quantity") * 100).cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val truth = li.groupBy(_._1).filter(_._2.length >= 5).map { case (ok, xs) =>
      val heaviest = xs.maxBy(x => (x._3, x._2))
      ok -> ((xs.length.toLong, xs.map(_._3).sum, heaviest._2, heaviest._3))
    }
    val got = run("q137_nested_rollup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === truth)
  }

  test("q138 argmax picks the max-balance supplier with smallest-key ties") {
    val sup = graft.Tables.load(spark, sf, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        round(col("s_acctbal") * 100).cast("long").as("bal"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val truth = sup.groupBy(_._1).map { case (nk, xs) =>
      val mx = xs.map(_._3).max
      nk -> ((xs.filter(_._3 == mx).map(_._2).min, mx))
    }
    val got = run("q138_argmax_supplier").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === truth)
  }

  test("q139 whitened z-scores replay from collected quantized vectors") {
    val vecs = graft.queries.Vectors.quantized(spark, sf)
      .select("vec_id", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val dims = vecs.head._2.length
    val n = vecs.length.toLong
    val truth = vecs.toMap.map { case (id, qv) =>
      id -> (0 until dims).map { d =>
        val sx = vecs.map(_._2(d)).sum
        val sxx = vecs.map(v => v._2(d) * v._2(d)).sum
        val den = n * sxx - sx * sx
        if (den <= 0) 0L
        else math.round(1000.0 * (qv(d) * n - sx) / math.sqrt(den.toDouble))
      }.toArray
    }
    // output contract: z-scores arrive comma-packed in one canonical
    // string (scalar columns only, for the oracle hash) — parse back
    val got = run("q139_whiten").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(",", -1).map(_.toLong)).toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (id, z) =>
      assert(got(id).toSeq === z.toSeq, s"vec $id")
    }
    // whitened dims are centered: per-dimension z sums ~ 0 (rounding only)
    (0 until dims).foreach { d =>
      val s = got.values.map(_(d)).sum
      assert(math.abs(s) <= got.size.toLong, s"dim $d not centered: $s")
    }
  }

  test("q147 rendezvous relayout: movers land only on new shards; ~4/20 move") {
    val rows = run("q147_rendezvous_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
    val total = rows.map(_._4).sum
    assert(total === graft.Tables.load(spark, sf, "documents").count())
    // the HRW structural guarantee: growing the ring never moves a doc
    // BETWEEN old shards — a mover's new winner must be a new shard
    rows.filterNot(_._3).foreach { case (o, n, _, _, _) =>
      assert(n >= 16, s"mover from shard $o landed on OLD shard $n")
    }
    rows.filter(_._3).foreach { case (o, n, _, _, _) => assert(o === n) }
    // expected movement 4/20 (vs ~19/20 for q129's mod rehash). The
    // realized fraction is DETERMINISTIC (fixed family constants fix
    // the win measure, ~0.228 on this corpus): bound it with a fixed
    // margin around 1/5, far below any mod-rehash outcome.
    val moved = rows.filterNot(_._3).map(_._4).sum.toDouble / total
    assert(math.abs(moved - 0.2) < 0.05, s"moved fraction $moved vs 0.2")
  }

  test("q148 novelty replays per source; each distinct gram is novel exactly once") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._3.length >= 3)
    def shingles(t: String) = (0 to t.length - 3).map(i => t.substring(i, i + 3)).distinct
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.sortBy(_._1).foreach { case (id, _, t) =>
      shingles(t).foreach(g => if (!firstDoc.contains(g)) firstDoc(g) = id)
    }
    val truth = docs.groupBy(_._2).map { case (src, xs) =>
      val per = xs.map { case (id, _, t) =>
        val gs = shingles(t)
        (gs.size.toLong, gs.count(g => firstDoc(g) == id).toLong)
      }
      src -> ((xs.length.toLong, per.map(_._1).sum, per.map(_._2).sum,
        per.count(_._2 == 0).toLong))
    }
    val got = run("q148_novelty_rate").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(got === truth)
    // conservation: every distinct corpus gram is novel in exactly one doc
    assert(got.values.map(_._3).sum === firstDoc.size.toLong)
  }

  test("q149 calibration: est exact per bucket; pair universe == sampled banding") {
    val rows = run("q149_minhash_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    rows.foreach { case (m, n, est, exact, err) =>
      assert(m >= 0 && m <= 6 && n > 0)
      // est_permille is CONSTANT within a match-count group — its mean
      // must reproduce the integer quantization exactly
      assert(est === ((1000 * m) / 6).toDouble, s"bucket $m est $est")
      assert(exact >= 0 && exact <= 1000)
      assert(err + 1e-9 >= math.abs(est - exact), "Jensen: mean|e| >= |mean e|")
    }
    // the scored pairs are exactly the banding's distinct candidates
    // thinned by the declared deterministic 1/32 Knuth pair-sample
    val cfg = graft.operators.MinHashLsh.Config(3, 2, universal = true)
    val banded = graft.operators.MinHashLsh.explodeBands(
      graft.Tables.load(spark, sf, "documents")
        .filter(length(col("text")) >= 3).select("doc_id", "text"), "text", cfg)
      .select("doc_id", "band", "band_key")
    val allPairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("b.doc_id") > col("a.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val nSampled = allPairs
      .filter(graft.Knuth.col(col("doc_a") * lit(524287L) + col("doc_b"), 1117L)
        % 32 === 0).count()
    val nAll = allPairs.count()
    assert(rows.map(_._2).sum === nSampled)
    // the sample is a strict, non-empty thinning of a larger universe
    assert(nSampled > 0 && nSampled < nAll)
  }

  test("q150 quantization error replays bit-exactly from collected floats") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val truth = (0 until dims).map { d =>
      val ems = vecs.map { v =>
        val x = v(d).toDouble * 1000
        math.floor((x - math.floor(x)) * 1000000).toLong
      }
      (d + 1).toLong -> ((ems.length.toLong, ems.sum, ems.max))
    }.toMap
    val got = run("q150_quant_error").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got === truth)
    // the grid loses less than one grid step everywhere, by construction
    got.values.foreach { case (_, _, mx) => assert(mx >= 0 && mx < 1000000) }
  }

  test("q151 cell purity replays from a naive nearest-centroid assignment") {
    val base = graft.queries.Vectors.quantized(spark, sf)
      .filter(col("qn") > 0).select("vec_id", "label", "qv").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val cents = base.sortBy(_._1).take(8).zipWithIndex
      .map { case ((_, _, qv), i) => (i, qv) }
    def sqd(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val assigned = base.map { case (id, label, qv) =>
      val cell = cents.map { case (cid, cv) => (sqd(qv, cv), cid) }.min._2
      (cell, label)
    }
    val truth = assigned.groupBy(_._1).map { case (cell, xs) =>
      val byLabel = xs.groupBy(_._2).map { case (l, g) => (l, g.length.toLong) }
      val (mLabel, mCnt) = byLabel.toSeq.maxBy { case (l, c) => (c, -l) }
      cell -> ((xs.length.toLong, byLabel.size.toLong, mLabel, mCnt))
    }
    val got = run("q151_cell_purity").collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
    assert(got === truth)
    got.foreach { case (_, (n, _, _, mc)) => assert(mc >= 1 && mc <= n) }
  }

  test("q152 Gini: run-length derivation equals the naive ranked formula") {
    val xs = graft.Tables.load(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("x"))
      .collect().map(_.getLong(1)).sorted
    val n = xs.length.toLong
    val s = xs.sum
    val a = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gini = (2.0 * a - (n + 1) * s) / (n.toDouble * s)
    val t = n - n / 10
    val topShare = xs.zipWithIndex.collect {
      case (x, i) if (i + 1) > t => x
    }.sum.toDouble / s
    val r = run("q152_activity_gini").collect().head
    assert(r.getLong(0) === n && r.getLong(1) === s)
    assert(math.abs(r.getDouble(2) - gini) < 1e-12, s"gini ${r.getDouble(2)} vs $gini")
    assert(math.abs(r.getDouble(3) - topShare) < 1e-12)
    assert(r.getDouble(2) >= 0 && r.getDouble(2) < 1)
  }

  test("q146 recall sweep: monotone in nProbe; exhaustive probe recalls 1.0") {
    val rows = run("q146_recall_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(2L, 4L, 8L))
    // prefix-nested probe sets: recall can only grow with nProbe (any
    // candidate displacing a true top-5 hit out-scores it and is thus
    // itself a true top-5 hit)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a._4 <= b._4, s"recall must not drop as probes widen: ${rows.toSeq}")
    }
    // nProbe = nCentroids probes every cell — exhaustive, recall exactly 1
    val last = rows.last
    assert(last._2 === last._3 && last._4 === 1.0,
      s"exhaustive probe must recall all: ${rows.toSeq}")
    rows.foreach(r => assert(r._3 > 0, "ground truth must be non-empty"))
  }

  test("q140 dedup savings replay from collected content hashes") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), md5(col("text")).as("fp"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val truth = docs.groupBy(_._1).map { case (src, xs) =>
      val groups = xs.groupBy(_._2).values.toSeq
      val nDocs = xs.length.toLong
      src -> ((nDocs, groups.length.toLong,
        groups.count(_.length > 1).toLong,
        groups.map(_.length - 1L).sum,
        groups.map(g => g.map(_._3).sum - g.map(_._3).min).sum,
        groups.map(_.length - 1L).sum.toDouble / nDocs))
    }
    val got = run("q140_dedup_savings").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    }.toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (src, tr) =>
      val g = got(src)
      assert((g._1, g._2, g._3, g._4, g._5) === ((tr._1, tr._2, tr._3, tr._4, tr._5)),
        s"$src counts")
      assert(math.abs(g._6 - tr._6) < 1e-12, s"$src rate")
    }
  }

  test("q141 heatmap conserves events and stays inside the calendar grid") {
    val rows = run("q141_activity_heatmap").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = graft.Tables.load(spark, sf, "events").count()
    assert(rows.map(_._4).sum === total, "every event lands in one cell")
    rows.foreach { case (_, dow, hod, n) =>
      assert(dow >= 1 && dow <= 7 && hod >= 0 && hod <= 23 && n > 0,
        s"cell out of grid: ($dow, $hod, $n)")
    }
    assert(rows.map(_._1).distinct.length === 5, "all event types present")
  }

  test("q142 integrity counts replay from collected key sets") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
    val o = graft.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val c = graft.Tables.load(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val oKeys = o.map(_._1).toSet
    val liKeys = li.toSet
    val r = run("q142_ref_integrity").collect().head
    assert(r.getLong(0) === li.count(k => !oKeys(k)).toLong, "orphans")
    assert(r.getLong(1) === o.count(x => !liKeys(x._1)).toLong, "childless")
    assert(r.getLong(2) === o.count(x => !c(x._2)).toLong, "dangling")
    assert(r.getLong(3) === li.length.toLong && r.getLong(4) === o.length.toLong)
  }

  test("q143 padding waste replays and bucketing never beats naive batching") {
    val lens = graft.Tables.load(spark, sf, "documents")
      .select("n_chars").collect().map(_.getLong(0))
    val gmx = lens.max
    val truth = lens.groupBy(l => (l + 127) / 128).map { case (b, xs) =>
      val (n, mx, tot) = (xs.length.toLong, xs.max, xs.sum)
      b -> ((n, mx, tot, n * mx - tot, n * gmx - tot))
    }
    val got = run("q143_padding_waste").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) Option.empty[Double] else Some(r.getDouble(6))))
    }.toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (b, (n, mx, tot, wb, wn)) =>
      val g = got(b)
      assert((g._1, g._2, g._3, g._4, g._5) === ((n, mx, tot, wb, wn)), s"bucket $b")
      assert(g._4 <= g._5, s"bucket $b: bucketing must never waste more than naive")
      g._6.foreach(r => assert(math.abs(r - wb.toDouble / wn) < 1e-12))
    }
  }

  test("q144 syndication pairs replay from collected lead fingerprints") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), md5(substring(col("text"), 1, 64)).as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val fs = docs.groupBy(identity).map { case ((src, fp), v) => (fp, src, v.length.toLong) }
    val truth = (for {
      (fp, sa, na) <- fs; (fp2, sb, nb) <- fs
      if fp2 == fp && sa < sb
    } yield ((sa, sb), (na, nb))).groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.map(_._2._1).sum, xs.map(_._2._2).sum))
    }
    val got = run("q144_syndication").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === truth)
    assert(got.nonEmpty, "corpus must show cross-source syndication")
  }

  test("q145 lift replays from collected daily baskets") {
    val b = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("date").cast("string").as("day"),
        col("event_type"))
      .distinct().collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getString(2)))
    val baskets = b.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nB = baskets.size.toLong
    val types = b.map(_._2).distinct.sorted
    val n1 = types.map(t => t -> baskets.values.count(_(t)).toLong).toMap
    val truth = (for {
      ta <- types; tb <- types if ta < tb
      nab = baskets.values.count(s => s(ta) && s(tb)).toLong if nab > 0
    } yield (ta, tb) -> ((nab, n1(ta), n1(tb),
      (nab * nB).toDouble / (n1(ta) * n1(tb))))).toMap
    val got = run("q145_cooccurrence_lift").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (k, (nab, na, nb2, lift)) =>
      val g = got(k)
      assert((g._1, g._2, g._3) === ((nab, na, nb2)), s"$k counts")
      assert(math.abs(g._4 - lift) < 1e-12, s"$k lift")
    }
  }

  test("q116 diversity metrics replay exactly from collected token counts") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val truth = docs.groupBy(_._1).map { case (src, xs) =>
      val counts = xs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map { case (_, v) => v.length.toLong }.toArray
      val tT = counts.sum.toDouble
      val sS = counts.map(c => c * c).sum.toDouble
      src -> ((counts.sum, counts.length.toLong,
        counts.length.toDouble / tT, 1.0 - sS / (tT * tT), tT * tT / sS,
        counts.max.toDouble / tT))
    }
    val got = run("q116_lexical_diversity").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    }.toMap
    assert(got.keySet === truth.keySet)
    truth.foreach { case (src, (nTok, nTyp, ttr, simp, eff, top)) =>
      val g = got(src)
      assert(g._1 === nTok && g._2 === nTyp, s"$src counts: $g")
      assert(math.abs(g._3 - ttr) < 1e-12, s"$src ttr")
      assert(math.abs(g._4 - simp) < 1e-12, s"$src simpson")
      assert(math.abs(g._5 - eff) < 1e-9, s"$src eff_vocab")
      assert(math.abs(g._6 - top) < 1e-12, s"$src top_share")
    }
  }

  test("q153 KMV replays from collected user ids; exact when d < k") {
    // the query's mix, re-derived independently in Scala
    def mix(u: Long): Long = {
      val h0 = ((u + 9176L) * 2654435761L) % 4294967296L
      val h2 = ((h0 ^ (h0 / 65536)) * 1597334677L) % 4294967296L
      h2 ^ (h2 / 8192)
    }
    val byType = graft.Tables.load(spark, sf, "events")
      .select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct }
    val truth = byType.map { case (t, users) =>
      val hs = users.map(mix).sorted
      assert(hs.distinct.length === hs.length, "mix must be injective here")
      val d = hs.length.toLong
      val est = if (d < 64) d else (63L * 4294967296L) / hs(63)
      t -> ((d, est, (est compare d).sign.toLong,
        (math.abs(est - d) * 1000) / d))
    }
    val got = run("q153_kmv_distinct").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got === truth)
    // sf0.001 exercises the d < k exact path; the estimator path is
    // covered by the sf0.01+ oracle runs (150 users ≥ k = 64)
    got.foreach { case (t, (d, est, sgn, _)) =>
      if (d < 64) assert(est === d && sgn === 0L, s"$t small-d must be exact")
    }
  }

  test("q162 HLL registers replay from collected user ids") {
    def mix(u: Long): Long = {
      val h0 = (((u + 9176L) % 2147483648L) * 2654435761L) % 4294967296L
      val h2 = ((h0 ^ (h0 / 65536)) * 1597334677L) % 4294967296L
      h2 ^ (h2 / 8192)
    }
    val byType = graft.Tables.load(spark, sf, "events")
      .select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct }
    val truth = byType.map { case (t, users) =>
      val hs = users.map(mix).distinct
      val regs = hs.groupBy(_ % 64).map { case (j, ws) =>
        j -> ws.map { h =>
          val w = h / 64
          if (w == 0) 27L else 27L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        }.max
      }
      val s = regs.values.map(m => 1L << (27 - m)).sum +
        (64L - regs.size) * 134217728L
      val est = (709L * 4096L * 134217728L) / (1000L * s)
      val d = hs.length.toLong
      t -> ((d, regs.size.toLong, 64L - regs.size, s, est,
        (est compare d).sign.toLong, (math.abs(est - d) * 1000) / d))
    }
    val got = run("q162_hll_distinct").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    }.toMap
    assert(got === truth)
    // every register holds a rank in [1, 27] once hit; the scaled sum
    // is bounded by the all-zero state
    got.values.foreach { case (_, hit, zero, s, _, _, _) =>
      assert(hit + zero === 64L && s >= 64L && s <= 64L * 134217728L)
    }
  }

  test("q163 near-dup eval replays pair-by-pair from collected doc state") {
    // per-doc detector state from the (separately unit-tested) kernels;
    // the SAMPLE, thresholds, confusion counts, and unpivot are
    // re-derived here in plain Scala
    val docs = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        graft.functions.MinHash.minhashFast(col("text"), 6).as("sig"),
        graft.functions.SimHash.simhash16(col("text")).as("simhash"),
        graft.functions.Jaccard.gramCodes3(col("text")).as("grams"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq,
        r.getLong(2), r.getSeq[Long](3).toSet))
      .sortBy(_._1)
    def sampled(a: Long, b: Long): Boolean =
      ((((a * 524287L + b + 2803L) % 2147483648L) * 2654435761L)
        % 4294967296L) % 64L == 0L
    var mh = (0L, 0L, 0L, 0L)
    var sh = (0L, 0L, 0L, 0L)
    for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (da, sa, va, ga) = docs(i); (db, sb, vb, gb) = docs(j)
      if sampled(da, db)
    } {
      val nCommon = ga.intersect(gb).size.toLong
      val isDup = (1000L * nCommon) / (ga.size + gb.size - nCommon) >= 500L
      val mhPred = (0 until 6).count(k => sa(k) == sb(k)) >= 4
      val shPred = java.lang.Long.bitCount(va ^ vb) <= 3
      def upd(t: (Long, Long, Long, Long), p: Boolean) = (
        t._1 + (if (isDup && p) 1 else 0), t._2 + (if (!isDup && p) 1 else 0),
        t._3 + (if (isDup && !p) 1 else 0), t._4 + (if (!isDup && !p) 1 else 0))
      mh = upd(mh, mhPred); sh = upd(sh, shPred)
    }
    def row(t: (Long, Long, Long, Long)) = {
      val (tp, fp, fn, tn) = t
      (tp, fp, fn, tn,
        if (tp + fp == 0) -1L else (1000 * tp) / (tp + fp),
        if (tp + fn == 0) -1L else (1000 * tp) / (tp + fn))
    }
    val truth = Map("minhash_b3r2" -> row(mh), "simhash16_h3" -> row(sh))
    val got = run("q163_neardup_eval").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got === truth)
    // the sampled universe must be non-trivial: some pairs on each side
    // of the ground-truth label
    val (tp, fp, fn, tn) = mh
    assert(tp + fp + fn + tn > 0, "sample must be non-empty")
  }

  test("q164 langid: confusion matrix conserves the test half; profiles bounded") {
    val rows = run("q164_langid_ngram").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // row sums per true lang == per-lang held-out doc counts
    val testCounts = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3 && col("doc_id") % 2 === 1)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rowSums = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(rowSums === testCounts)
    // predictions come only from trained languages (or the declared
    // zero-overlap bucket)
    val langs = testCounts.keySet + "(none)"
    assert(rows.map(_._2).toSet.subsetOf(langs))
    // NOTE: no accuracy assertion — the synthetic fixture's lang label
    // is independent of its text (same token distribution for every
    // language), so chance-level confusion is the CORRECT output here.
    // What must hold is determinism: the argmax tie-breaks make the
    // matrix identical on every run
    val again = run("q164_langid_ngram").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }

  test("q154 funnel: chained stages, replayed rule by rule") {
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    def rules(text: String): Seq[Boolean] = {
      val len = text.length.toLong
      val toks = text.split(" ", -1)
      val wc = toks.length.toLong
      val nd = text.count(_.isDigit).toLong
      val sw = toks.count(Set("the", "and", "of", "to", "in", "a")).toLong
      Seq(len >= 200, wc >= 10 && wc <= 100000,
        3 * wc <= len - wc + 1 && len - wc + 1 <= 10 * wc,
        sw >= 2, 5 * nd <= len)
    }
    val preds = texts.map(rules)
    val surv = (0 to 5).map(i => preds.count(_.take(i).forall(identity)).toLong)
    val got = run("q154_filter_funnel").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.map(_._2).toSeq ===
      Seq("min_length", "word_count", "mean_word_len", "stopword_hits", "digit_ratio"))
    got.zipWithIndex.foreach { case ((_, rule, nIn, nFail, nOut), i) =>
      assert(nIn === surv(i), s"$rule n_in")
      assert(nOut === surv(i + 1), s"$rule n_out")
      assert(nFail === nIn - nOut, s"$rule fail = in - out")
      assert(nOut <= nIn, s"$rule monotone")
    }
    // stages chain: each stage's n_in is the previous stage's n_out
    got.zip(got.tail).foreach { case (a, b) => assert(a._5 === b._3) }
    assert(got.head._3 === texts.length.toLong)
  }

  test("q155 profile replays from collected columns") {
    val rows = graft.Tables.load(spark, sf, "documents")
      .select("lang", "source", "doc_id", "n_chars").collect()
    val cols: Map[String, Array[String]] = Map(
      "lang" -> rows.map(r => if (r.isNullAt(0)) null else r.getString(0)),
      "source" -> rows.map(r => if (r.isNullAt(1)) null else r.getString(1)),
      "doc_id" -> rows.map(_.getLong(2).toString),
      "n_chars" -> rows.map(_.getLong(3).toString))
    val truth = cols.map { case (name, vs) =>
      val nn = vs.filter(_ != null)
      val counts = nn.groupBy(identity).map(_._2.length.toLong)
      name -> ((vs.length.toLong, (vs.length - nn.length).toLong,
        counts.size.toLong,
        if (nn.isEmpty) 0L else (counts.max * 1000) / nn.length))
    }
    val got = run("q155_column_profile").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got === truth)
  }

  test("q156 FD audit replays from collected pairs") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "lang").collect()
    val cust = graft.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
    def audit(pairs: Seq[(String, String)]): (Long, Long, Long) = {
      val fan = pairs.distinct.groupBy(_._1).map(_._2.length.toLong).toSeq
      (fan.length.toLong, fan.count(_ > 1).toLong, fan.max)
    }
    val truth = Map(
      "doc_id->source" -> audit(docs.toSeq.map(r => (r.getLong(0).toString, r.getString(1)))),
      "source->lang" -> audit(docs.toSeq.map(r => (r.getString(1), r.getString(2)))),
      "c_custkey->c_nationkey" -> audit(
        cust.toSeq.map(r => (r.getLong(0).toString, r.getInt(1).toString))))
    val got = run("q156_fd_audit").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got === truth)
    // the declared key FDs must actually hold on the fixtures
    assert(got("doc_id->source")._2 === 0L)
    assert(got("c_custkey->c_nationkey")._2 === 0L)
  }

  test("q157 LPA replays 2 naive synchronous rounds from collected edges") {
    val pairs = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (c, s) => Seq((c, -(s + 1)), (-(s + 1), c)) }
    val bySrc = edges.groupBy(_._1)
    var label = bySrc.keys.map(v => v -> v).toMap
    for (_ <- 1 to 2) {
      label = bySrc.map { case (_, es) => es }.flatten
        .groupBy(_._2).map { case (dst, ins) =>
          val counts = ins.map(e => label(e._1))
            .groupBy(identity).map { case (l, g) => (l, g.size) }
          // mode, tie → smallest label
          dst -> counts.toSeq.maxBy { case (l, c) => (c, -l) }._1
        }
    }
    val got = run("q157_label_propagation").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === label)
    // at least one genuine merge: some vertex adopted another's label
    assert(got.exists { case (v, l) => v != l })
  }

  test("q158 truncation recall replays from collected vectors; full width recalls 1.0") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .filter { case (_, qv) => qv.map(x => x * x).sum > 0 }
    def top5(d: Int): Map[Long, Seq[Long]] = {
      val tr = vecs.map { case (id, qv) => (id, qv.take(d)) }
        .map { case (id, tv) => (id, tv, tv.map(x => x * x).sum) }
        .filter(_._3 > 0)
      tr.filter(_._1 < 20).map { case (qid, qtv, qtn) =>
        val scored = tr.filter(_._1 != qid).map { case (cid, ctv, ctn) =>
          val dot = qtv.zip(ctv).map { case (x, y) => x * y }.sum
          (cid, dot.toDouble / math.sqrt(qtn.toDouble * ctn.toDouble))
        }
        qid -> scored.sortBy { case (id, sc) => (-sc, id) }.take(5).map(_._1).toSeq
      }.toMap
    }
    val exact = top5(64)
    val truthByD = Seq(16, 32, 64).map { d =>
      val approx = top5(d)
      val hits = exact.map { case (qid, ids) =>
        ids.count(approx.getOrElse(qid, Nil).contains)
      }.sum.toLong
      val k = exact.values.map(_.length).sum.toLong
      d.toLong -> ((hits, k))
    }.toMap
    val got = run("q158_truncation_sweep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === truthByD.keySet)
    truthByD.foreach { case (d, (hits, k)) =>
      val (gh, gk, gr) = got(d)
      assert(gh === hits && gk === k, s"d=$d: got ($gh,$gk) want ($hits,$k)")
      assert(math.abs(gr - hits.toDouble / k) < 1e-12)
    }
    // the full-width point IS the ground truth
    val (h64, k64, r64) = got(64L)
    assert(h64 === k64 && r64 === 1.0, s"full width must recall all: $got")
  }

  test("q159 phrase search equals a naive trigram count for the same phrases") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tris = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1)
      (0 until tk.length - 2).map(i => (id, s"${tk(i)} ${tk(i + 1)} ${tk(i + 2)}"))
    }
    val top3 = tris.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(3).map(_._1).toSet
    val truth = tris.filter(t => top3(t._2)).groupBy(_._2).map { case (p, xs) =>
      p -> ((xs.length.toLong, xs.map(_._1).distinct.length.toLong))
    }
    val got = run("q159_phrase_search").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === truth)
    assert(got.nonEmpty && got.forall { case (_, (h, d)) => h >= d && d >= 1 })
  }

  test("q160 KMV algebra replays from collected sketches; small merges are exact") {
    def mix(u: Long): Long = {
      val h0 = ((u + 9176L) * 2654435761L) % 4294967296L
      val h2 = ((h0 ^ (h0 / 65536)) * 1597334677L) % 4294967296L
      h2 ^ (h2 / 8192)
    }
    val byType = graft.Tables.load(spark, sf, "events")
      .select("event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(x => mix(x._2)).distinct.sorted
      }
    val truth = (for {
      (ta, ha) <- byType; (tb, hb) <- byType if ta < tb
    } yield {
      val ska = ha.take(64)
      val skb = hb.take(64)
      val mg = (ska ++ skb).distinct.sorted.take(64)
      val unionEst = if (mg.length < 64) mg.length.toLong
                     else 63L * 4294967296L / mg(63)
      val nShared = mg.count(x => ska.contains(x) && skb.contains(x)).toLong
      val interExact = ha.count(hb.toSet).toLong
      val unionExact = ha.length + hb.length - interExact
      (ta, tb) -> ((unionExact, unionEst, interExact,
        nShared * unionEst / mg.length,
        1000L * interExact / unionExact, 1000L * nShared / mg.length))
    }).toMap
    val got = run("q160_kmv_algebra").collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    }.toMap
    assert(got === truth)
    // merge exactness: a merged sketch below capacity IS the union, so
    // every estimate collapses to its exact counterpart
    got.foreach { case ((ta, tb), (ue, uEst, ie, iEst, jE, jEst)) =>
      val small = byType(ta).length < 64 && byType(tb).length < 64 && ue < 64
      if (small) {
        assert(uEst === ue && iEst === ie && jEst === jE,
          s"($ta,$tb): small-merge estimates must be exact")
      }
    }
  }

  // ----------------------------------------------------------- q165
  test("q165 zone-map audit replays from an independent Scala layout walk") {
    // independent z (bit interleave) and hilbert d (the standard
    // xy2d loop — NOT Layout.hilbertDf, which is under test via q99)
    def zOf(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))).sum
    def hOf(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 128L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 255 - x; y = 255 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val rowsIn = graft.Tables.load(spark, sf, "part")
      .select(col("p_partkey").cast("long"),
        col("p_size").cast("long").bitwiseAND(255L),
        (round(col("p_retailprice") * 10).cast("long") % 256))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val preds = Seq(("x_stripe", 8L, 15L, 0L, 255L),
      ("y_stripe", 0L, 255L, 64L, 79L), ("xy_box", 8L, 15L, 64L, 79L))
    val layouts = Map[String, ((Long, Long, Long)) => Long](
      "natural" -> { case (k, _, _) => k / 64 },
      "zorder" -> { case (_, x, y) => zOf(x, y) / 64 },
      "hilbert" -> { case (_, x, y) => hOf(x, y) / 64 })
    val truth = (for {
      (layout, blockOf) <- layouts.toSeq
      (pred, lx, hx, ly, hy) <- preds
    } yield {
      val blocks = rowsIn.groupBy(blockOf).values.toSeq
      val hit = blocks.filter { b =>
        b.map(_._2).min <= hx && b.map(_._2).max >= lx &&
          b.map(_._3).min <= hy && b.map(_._3).max >= ly
      }
      val matching = rowsIn.count(r =>
        r._2 >= lx && r._2 <= hx && r._3 >= ly && r._3 <= hy).toLong
      val scanned = hit.map(_.length.toLong).sum
      (layout, pred) -> ((blocks.length.toLong, hit.length.toLong,
        rowsIn.length.toLong, scanned, matching,
        1000L * scanned / rowsIn.length))
    }).toMap
    val got = run("q165_zonemap_prune").collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    }.toMap
    assert(got === truth)
    // zone maps are conservative: scanned always covers matching
    got.foreach { case ((l, p), (_, _, _, scanned, matching, _)) =>
      assert(scanned >= matching, s"($l,$p): pruning lost matching rows")
    }
  }

  // ----------------------------------------------------------- q166
  test("q166 bloom sweep replays from a Scala filter build") {
    val family = Seq((101L, 2654435761L), (202L, 2246822519L),
      (303L, 3266489917L))
    def pos(key: Long, i: Int): Long = {
      val (salt, mult) = family(i)
      val h0 = ((key + salt) % 2147483648L) * mult % 4294967296L
      val h2 = (h0 ^ (h0 >> 16)) * 1597334677L % 4294967296L
      (h2 ^ (h2 >> 13)) % 1024L
    }
    val cust = graft.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val bld = cust.filter(_._2 == "BUILDING").map(_._1)
    val prb = cust.filter(_._2 != "BUILDING").map(_._1)
    val got = run("q166_bloom_fpr").collect().map { r =>
      r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    }.toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    (1 to 3).foreach { k =>
      val bits = bld.flatMap(key => (0 until k).map(pos(key, _))).toSet
      val fpKeys = prb.filter(key => (0 until k).forall(i => bits(pos(key, i))))
      val fill = bits.size.toLong
      val expected =
        (1 to k).foldLeft(1000L)((acc, _) => acc * fill) / (1 to k)
          .foldLeft(1L)((acc, _) => acc * 1024L)
      assert(got(k.toLong) === ((bld.length.toLong, fill, prb.length.toLong,
        fpKeys.length.toLong, 1000L * fpKeys.length / prb.length, expected)),
        s"k=$k mismatch")
    }
  }

  // ----------------------------------------------------------- q167
  test("q167 cuts replay via the HOF signature over collected frames") {
    // independent signature path: the FunctionsSpec HOF formulation of
    // packedSig, evaluated per frame slice, then a plain Scala window
    val hofPk =
      """aggregate(
           transform(sequence(0, 63),
             i -> least(ascii(substring(fr, cast(1 + (i * length(fr)) div 64 as int), 1)) div 32, 7)),
           0L, (acc, c) -> acc + shiftleft(1L, cast(7 * c as int)))"""
    val frames = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) % 3 === 2 && length(col("text")) >= 33)
      .select(col("doc_id"), col("text"),
        explode(expr(
          "sequence(0, cast(ceil(length(text) / 32.0) as bigint) - 1)"))
          .as("frame_no"))
      .selectExpr("doc_id", "frame_no",
        "substring(text, cast(frame_no * 32 + 1 as int), 32) AS fr")
      .selectExpr("doc_id", "frame_no", s"$hofPk AS pk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def digits(pk: Long): Seq[Long] = (0 until 8).map(b => (pk >> (7 * b)) & 127L)
    val truth = frames.groupBy(_._1).map { case (doc, fs) =>
      val sigs = fs.sortBy(_._2).map(f => f._2 -> digits(f._3)).toSeq
      val dists = sigs.sliding(2).collect { case Seq((_, a), (fn, b)) =>
        fn -> a.zip(b).map { case (u, v) => math.abs(u - v) }.sum
      }.toSeq
      val cuts = dists.filter(_._2 >= 24)
      doc -> ((sigs.length.toLong, cuts.length.toLong, dists.map(_._2).sum,
        dists.map(_._2).max, cuts.map(_._1).minOption.getOrElse(-1L)))
    }
    val got = run("q167_shot_boundary").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got === truth)
    // detector shape: cuts are bounded by transitions; the sentinel
    // first_cut = -1 appears exactly when no cut fired
    got.foreach { case (doc, (nf, nc, total, mx, first)) =>
      assert(nc <= nf - 1 && total >= mx, s"doc $doc bounds")
      assert((nc == 0) == (first == -1L), s"doc $doc sentinel")
    }
  }

  // ----------------------------------------------------------- q169
  test("q169 boilerplate shares replay from collected gram sets") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .selectExpr("doc_id", "source",
        "array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))) AS gs")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    val nDocs = docs.length
    val dfm = docs.flatMap(_._3).groupBy(identity)
      .map { case (g, o) => g -> o.length }
    val boiler = dfm.filter { case (_, d) => 5 * d >= nDocs }.keySet
    val perDoc = docs.map { case (_, src, gs) =>
      (src, gs.length.toLong, gs.count(boiler).toLong)
    }
    val truth = perDoc.groupBy(_._1).map { case (src, rows) =>
      val ng = rows.map(_._2).sum
      val nb = rows.map(_._3).sum
      src -> ((rows.length.toLong, ng, nb, 1000L * nb / ng,
        rows.count(r => 10 * r._3 >= 9 * r._2).toLong,
        rows.map(r => 1000L * r._3 / r._2).max))
    }
    val got = run("q169_boilerplate").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got === truth)
  }

  // ----------------------------------------------------------- q170
  test("q170 heavy hitters replay from exact collected counts") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val truth = ev.groupBy(_._1).flatMap { case (tpe, rows) =>
      val counts = rows.groupBy(_._2).map { case (u, o) => u -> o.length.toLong }
      val total = rows.length.toLong
      counts.toSeq.sortBy { case (u, n) => (-n, u) }.take(3).zipWithIndex
        .map { case ((u, n), i) =>
          (tpe, i + 1L) -> ((u, n, 1000L * n / total))
        }
    }.toMap
    val got = run("q170_heavy_hitters").collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got === truth)
  }

  // ----------------------------------------------------------- q171
  test("q171 merged aggregates equal a full Scala recompute; every row consistent") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE) AS d",
        "CAST(value AS DECIMAL(18,4)) AS v")
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDecimal(2)))
    val mxd = ev.map(_._2).maxBy(_.toEpochDay)
    def roll(rows: Array[(String, java.time.LocalDate, java.math.BigDecimal)])
        : Map[String, (Long, java.math.BigDecimal)] =
      rows.groupBy(_._1).map { case (t, o) =>
        t -> ((o.length.toLong,
          o.map(_._3).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))))
      }
    val base = roll(ev.filter(_._2.isBefore(mxd)))
    val delta = roll(ev.filter(_._2 == mxd))
    val full = roll(ev)
    val got = run("q171_incremental_agg").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    }.toMap
    assert(got.keySet === full.keySet)
    got.foreach { case (t, (nb, nd, nm, sm, nf, sf_, cons)) =>
      assert(nb === base.get(t).map(_._1).getOrElse(0L), s"$t n_base")
      assert(nd === delta.get(t).map(_._1).getOrElse(0L), s"$t n_delta")
      assert(nm === nb + nd && nm === nf && nf === full(t)._1, s"$t counts")
      assert(sm === sf_ && sf_ === full(t)._2.doubleValue, s"$t sums")
      assert(cons, s"$t must be consistent — the IVM algebra broke")
    }
  }

  // ----------------------------------------------------------- q172
  test("q172 vocabulary growth replays from collected gram sets") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))) AS gs")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val mxd = docs.map(_._1).max
    def bucket(d: Long): Long = d * 10 / (mxd + 1)
    val firstSeen = docs.flatMap { case (d, gs) => gs.map(_ -> d) }
      .groupBy(_._1).map { case (_, o) => o.map(_._2).min }
    val nNew = firstSeen.groupBy(bucket).map { case (b, o) => b -> o.size.toLong }
    val nDocs = docs.groupBy(d => bucket(d._1))
      .map { case (b, o) => b -> o.length.toLong }
    val nInst = docs.groupBy(d => bucket(d._1))
      .map { case (b, o) => b -> o.map(_._2.length.toLong).sum }
    val buckets = nDocs.keys.toSeq.sorted
    var cum = 0L
    val truth = buckets.map { b =>
      val nn = nNew.getOrElse(b, 0L)
      cum += nn
      b -> ((nDocs(b), nInst(b), nn, cum, 1000L * nn / nInst(b)))
    }.toMap
    val got = run("q172_vocab_growth").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got === truth)
    // growth flattens: the last bucket introduces less than the first
    val first = got(got.keys.min)._5
    val last = got(got.keys.max)._5
    assert(last <= first, "novelty must not grow over the corpus")
  }

  // ----------------------------------------------------------- q173
  test("q173 AMS counters replay from collected counts; estimate formula exact") {
    def mix(u: Long): Long = {
      val h0 = ((u + 5711L) % 2147483648L) * 2654435761L % 4294967296L
      val h2 = (h0 ^ (h0 >> 16)) * 1597334677L % 4294967296L
      h2 ^ (h2 >> 13)
    }
    val counts = graft.Tables.load(spark, sf, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, u), o) => (t, u, o.length.toLong) }
    val truth = counts.groupBy(_._1).map { case (t, rows) =>
      val f2 = rows.map(r => r._3 * r._3).sum
      val ctrs = (0 until 16).map { j =>
        rows.map { case (_, u, c) =>
          if (((mix(u) >> j) & 1L) == 1L) c else -c
        }.sum
      }
      val est = ctrs.map(x => x * x).sum / 16
      val sign = java.lang.Long.signum(est - f2).toLong
      t -> ((f2, est, sign, math.abs(est - f2) * 1000 / f2))
    }
    val got = run("q173_ams_f2").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    }.toMap
    assert(got === truth.toMap)
    // the sketch earns its name: every estimate within 50% of exact
    got.foreach { case (t, (_, _, _, errPm)) =>
      assert(errPm <= 500, s"$t: AMS estimate off by ${errPm}‰")
    }
  }

  // ----------------------------------------------------------- q174
  test("q174 containments replay from collected gram sets; classes partition") {
    val grams = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .selectExpr("doc_id",
        "array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))) AS gs")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val rows = run("q174_containment").collect()
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, s"pair order ($a,$b)")
      assert(seen.add((a, b)), s"duplicate pair ($a,$b)")
      val (ga, gb) = (grams(a), grams(b))
      val common = (ga & gb).size.toLong
      val (nga, ngb) = (ga.size.toLong, gb.size.toLong)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((nga, ngb, common)))
      val (ca, cb) = (1000 * common / nga, 1000 * common / ngb)
      val j = 1000 * common / (nga + ngb - common)
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) === ((ca, cb, j)))
      val expected =
        if (3 * j >= 2000) "near_dup"
        else if (ca >= 800 || cb >= 800) "contains"
        else "overlap"
      assert(r.getString(8) === expected, s"($a,$b) class")
    }
    // the queue finds genuinely asymmetric relations Jaccard misses
    assert(rows.exists(_.getString(8) == "contains"),
      "no containment found — the detector is vacuous on this corpus")
  }

  // ----------------------------------------------------------- q175
  test("q175 k-core peeling equals a naive Scala peel") {
    val pairs = graft.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), -(r.getLong(1) + 1)))
    val edges = pairs.flatMap { case (c, s2) => Seq(c -> s2, s2 -> c) }
    def degrees(es: Array[(Long, Long)]): Map[Long, Long] =
      es.groupBy(_._1).map { case (n, o) => n -> o.length.toLong }
    val d0 = degrees(edges)
    val a1 = d0.filter(_._2 >= 3).keySet
    val e1 = edges.filter(e => a1(e._1) && a1(e._2))
    val d1 = degrees(e1)
    val a2 = d1.filter(_._2 >= 3).keySet
    val truth = d0.map { case (n, deg) =>
      val status =
        if (a2(n)) "core" else if (a1(n)) "peeled_r2" else "peeled_r1"
      n -> ((deg, d1.getOrElse(n, 0L), status))
    }
    val got = run("q175_kcore").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))
    }.toMap
    assert(got === truth)
    // peeling monotone: residual degree never exceeds the initial
    got.foreach { case (n, (deg0, deg1, _)) =>
      assert(deg1 <= deg0, s"node $n degree grew")
    }
    assert(got.values.exists(_._3 == "core"), "3-core must be non-empty here")
  }

  // ----------------------------------------------------------- q176
  test("q176 lateness audit replays from an arrival-ordered Scala walk") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = ev.groupBy(_._1).map { case (t, rows) =>
      var runmax = Long.MinValue
      val lates = rows.sortBy(_._2).map { case (_, _, us) =>
        runmax = math.max(runmax, us)
        runmax - us
      }
      val n = lates.length.toLong
      val nLate = lates.count(_ > 0).toLong
      t -> ((n, nLate, 1000 * nLate / n,
        lates.count(_ > 3600000000L).toLong,
        lates.max / 1000000, lates.sum / n))
    }
    val got = run("q176_lateness_audit").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got === truth)
  }

  // ----------------------------------------------------------- q177
  test("q177 two-phase concurrency equals a single-sorted Scala sweep") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val truth = ev.groupBy(_._1).map { case (t, rows) =>
      val deltas = rows.flatMap { case (_, us) =>
        Seq((us, 1), (us + 1800000000L, -1))
      }.sortBy { case (time, d) => (time, d) }
      var conc = 0L
      var mx = 0L
      var tAt = Long.MaxValue
      deltas.foreach { case (time, d) =>
        conc += d
        if (conc > mx) { mx = conc; tAt = time }
      }
      t -> ((rows.length.toLong, mx, tAt))
    }
    val got = run("q177_max_concurrency").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got === truth)
    // sanity: at least one interval is always active at its own start
    got.values.foreach { case (_, mx, _) => assert(mx >= 1) }
  }

  // ----------------------------------------------------------- q178
  test("q178 Lloyd step replays from collected vectors") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .filter { case (_, qv) => qv.map(x => x * x).sum > 0 }
      .sortBy(_._1)
    val seeds = vecs.take(8).map(_._2).zipWithIndex.map(_.swap).toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val assigned = vecs.map { case (id, qv) =>
      val best = seeds.toSeq.map { case (c, cv) => (d2(qv, cv), c) }.min
      (id, qv, best._2, best._1)
    }
    val truth = assigned.groupBy(_._3).map { case (c, members) =>
      val newc = (0 until 64).map { d =>
        val s0 = members.map(_._2(d)).sum
        s0 / members.length // Long division truncates like both engines
      }
      c.toLong -> ((members.length.toLong, members.map(_._4).sum,
        newc.zip(seeds(c)).map { case (a, b) => math.abs(a - b) }.sum))
    }
    val got = run("q178_lloyd_step").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got === truth)
  }

  // ----------------------------------------------------------- q179
  test("q179 incremental apply equals the q105 rebuild; both stitch paths fire") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    val applied = run("q179_scd2_apply").collect().map(key).sortBy(identity)
    val rebuilt = run("q105_scd2_islands").collect().map(key).sortBy(identity)
    assert(applied.length === rebuilt.length)
    assert(applied === rebuilt, "apply diverged from the rebuild")
    // the fixture must exercise BOTH boundary cases, or the test is
    // vacuous: some users' last-day events continue their prior run
    // (merge) and some open a new one
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS us",
        "event_id", "CAST(ts AS DATE) AS d")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDate(4).toLocalDate))
    val cut = ev.map(_._5).maxBy(_.toEpochDay)
    val byUser = ev.groupBy(_._1)
    var merges = 0
    var breaks = 0
    byUser.values.foreach { rows =>
      val (delta, base) = rows.partition(_._5 == cut)
      if (delta.nonEmpty && base.nonEmpty) {
        val lastBaseType = base.maxBy(r => (r._3, r._4))._2
        val firstDeltaType = delta.minBy(r => (r._3, r._4))._2
        if (lastBaseType == firstDeltaType) merges += 1 else breaks += 1
      }
    }
    assert(merges > 0, "no run-continuation case in fixture")
    assert(breaks > 0, "no new-run case in fixture")
  }

  // ----------------------------------------------------------- q180
  test("q180 range boundaries replay from a collected value histogram") {
    val qs = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("CAST(round(l_quantity) AS BIGINT)")
      .collect().map(_.getLong(0))
    val hist = qs.groupBy(identity).map { case (v, o) => v -> o.length.toLong }
      .toSeq.sortBy(_._1)
    val n = qs.length.toLong
    val cum = hist.scanLeft((0L, 0L)) { case ((_, c), (v, cnt)) =>
      (v, c + cnt)
    }.tail
    val truth = (1 to 32).map { b =>
      val (hi, cm) = cum.find { case (_, c) => 32 * c >= b * n }.get
      (b.toLong, hi, cm)
    }
    var prev = 0L
    val sized = truth.map { case (b, hi, cm) =>
      val rows = cm - prev
      prev = cm
      b -> ((hi, rows, 1000L * rows * 32 / n))
    }.toMap
    val got = run("q180_range_boundaries").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got === sized)
    // completeness: the buckets partition the corpus exactly
    assert(got.values.map(_._2).sum === n)
    // the last boundary covers the maximum value
    assert(got(32L)._1 === hist.last._1)
  }

  // ----------------------------------------------------------- q181
  test("q181 pipeline attrition: stages replay where independent, chain monotone") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .filter(length(col("text")) >= 3)
      .selectExpr("doc_id", "source", "lang", "text", "md5(CAST(text AS BINARY)) AS h")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    val minPerHash = docs.groupBy(_._5).map { case (h, o) => h -> o.map(_._1).min }
    val stop = Set("the", "and", "of", "to", "in", "a")
    val truth = docs.groupBy(_._2).map { case (src, rows) =>
      val nRaw = rows.length.toLong
      val nExact = rows.count(r => minPerHash(r._5) == r._1).toLong
      val qOk = rows.map { r =>
        r._1 -> (r._4.length >= 200 &&
          r._4.split(" ", -1).count(stop) >= 2)
      }.toMap
      val lOk = rows.map(r => r._1 -> (r._3 == "en")).toMap
      src -> ((nRaw, nExact, qOk, lOk))
    }
    val got = run("q181_curation_pipeline").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (src, (nRaw, nExact, nNear, nQual, nKept, pm)) =>
      val (tRaw, tExact, qOk, lOk) = truth(src)
      assert(nRaw === tRaw, s"$src raw")
      assert(nExact === tExact, s"$src exact")
      // chain is conjunctive — attrition can only shrink
      assert(nRaw >= nExact && nExact >= nNear && nNear >= nQual &&
        nQual >= nKept, s"$src monotonicity")
      // the later flags bound their stages (keep2 ∧ flag ⊆ flag)
      assert(nQual <= qOk.values.count(identity), s"$src quality bound")
      assert(nKept <= qOk.keys.count(k => qOk(k) && lOk(k)), s"$src lang bound")
      assert(pm === 1000 * nKept / nRaw, s"$src permille")
    }
    // the near-dup and language stages must actually bite somewhere
    val (raws, nears) = (got.values.map(_._1).sum, got.values.map(_._3).sum)
    val (quals, kepts) = (got.values.map(_._4).sum, got.values.map(_._5).sum)
    assert(nears < raws, "near-dup stage never fired")
    assert(kepts < quals, "language stage never fired")
    assert(kepts > 0, "pipeline kept nothing — thresholds degenerate")
  }

  // ----------------------------------------------------------- q182
  test("q182 drift profile replays from collected rows") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "lang", "source",
        "CAST(length(text) div 256 AS STRING) AS lb")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val cols = Map[String, ((Long, String, String, String)) => String](
      "lang" -> (_._2), "source" -> (_._3), "len_bucket" -> (_._4))
    val truth = cols.map { case (cn, f) =>
      def side(even: Boolean) = {
        val vals = docs.filter(d => (d._1 % 2 == 0) == even).map(f)
        val cnt = vals.groupBy(identity).map { case (v, o) => v -> o.length.toLong }
        (vals.length.toLong, cnt)
      }
      val (nE, cE) = side(true)
      val (nO, cO) = side(false)
      def modal(c: Map[String, Long]) =
        c.toSeq.sortBy { case (v, n) => (-n, v) }.head
      val (mvE, mcE) = modal(cE)
      val (mvO, mcO) = modal(cO)
      val l1 = (cE.keySet ++ cO.keySet).toSeq.map { v =>
        math.abs(1000 * cE.getOrElse(v, 0L) / nE - 1000 * cO.getOrElse(v, 0L) / nO)
      }.sum
      cn -> ((nE, nO, cE.size.toLong, cO.size.toLong, mvE, mvO,
        1000 * mcE / nE, 1000 * mcO / nO, l1))
    }
    val got = run("q182_profile_drift").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6), r.getLong(7),
        r.getLong(8), r.getLong(9)))
    }.toMap
    assert(got === truth)
  }

  // ----------------------------------------------------------- q183
  test("q183 walks replay from a collected-edge Scala walker") {
    val pairs = graft.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), -(r.getLong(1) + 1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (n, o) => n -> o.map(_._2) }
    def knuth(x: Long, salt: Long): Long =
      ((x + salt) % 2147483648L) * 2654435761L % 4294967296L
    def step(start: Long, cur: Long, t: Int): Long =
      adj(cur).minBy(d => (knuth(start * 97 + d * 13 + t * 7919, 4243L), d))
    val truth = adj.keys.filter(n => n >= 1 && n <= 20).map { s0 =>
      val n1 = step(s0, s0, 1)
      val n2 = step(s0, n1, 2)
      val n3 = step(s0, n2, 3)
      s0 -> ((n1, n2, n3))
    }.toMap
    val got = run("q183_random_walks").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got === truth)
    // walks respect the bipartite structure: hops alternate sign
    got.foreach { case (s0, (n1, n2, n3)) =>
      assert(n1 < 0 && n2 >= 0 && n3 < 0, s"walk from $s0 broke bipartiteness")
    }
  }

  // ----------------------------------------------------------- q184
  test("q184 histogram quantiles replay and bracket the exact percentile") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val truth = ev.groupBy(_._1).flatMap { case (t, rows) =>
      val hist = rows.map(r => math.floor(r._2).toLong)
        .groupBy(identity).map { case (b, o) => b -> o.length.toLong }
        .toSeq.sortBy(_._1)
      val n = rows.length.toLong
      Seq(5000, 9000, 9900).map { qp =>
        val target = (n * qp + 9999) / 10000
        var cum = 0L
        val b = hist.iterator.map { case (bb, c) => cum += c; (bb, cum) }
          .find(_._2 >= target).get._1
        (t, qp) -> ((b, b + 1, n, target))
      }
    }
    val got = run("q184_value_quantiles").collect().map { r =>
      (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    }.toMap
    assert(got === truth.toMap)
    // the unit bucket genuinely brackets the exact order statistic
    val sortedVals = ev.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map(_._2).sorted
    }
    got.foreach { case ((t, _), (lo, hi, _, target)) =>
      val exact = sortedVals(t)(target.toInt - 1)
      assert(exact >= lo && exact < hi, s"$t: $exact outside [$lo,$hi)")
    }
  }

  // ----------------------------------------------------------- q185
  test("q185 Kendall counts replay from the sampled pair universe") {
    val f = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT)",
        "CAST(size(filter(split(text, ' '), t -> t IN ('the','and','of','to','in','a'))) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def knuth(x: Long): Long =
      ((x + 6007L) % 2147483648L) * 2654435761L % 4294967296L
    val pairs = for {
      a <- f; b <- f
      if b._1 > a._1 && knuth(a._1 * 524287L + b._1) % 64 == 0
    } yield (a._2, a._3, b._2, b._3)
    val c = pairs.count { case (xa, ya, xb, yb) =>
      (xa > xb && ya > yb) || (xa < xb && ya < yb)
    }.toLong
    val d = pairs.count { case (xa, ya, xb, yb) =>
      (xa > xb && ya < yb) || (xa < xb && ya > yb)
    }.toLong
    val tx = pairs.count(p => p._1 == p._3 && p._2 != p._4).toLong
    val ty = pairs.count(p => p._2 == p._4 && p._1 != p._3).toLong
    val tb = pairs.count(p => p._1 == p._3 && p._2 == p._4).toLong
    val r = run("q185_kendall_sampled").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((pairs.length.toLong, c, d, tx, ty, tb,
        1000L * (c - d) / pairs.length)))
    // every sampled pair lands in exactly one class
    assert(c + d + tx + ty + tb === pairs.length.toLong)
  }

  // ----------------------------------------------------------- q168
  test("q168 decayed scores replay from collected events") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts)"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val anchor = ev.map(_._2).max
    val byType = ev.groupBy(_._1).map { case (tpe, rows) =>
      val decayed = rows.map { case (_, us) =>
        1024L >> math.min((anchor - us) / 604800000000L, 10L).toInt
      }.sum
      tpe -> ((rows.length.toLong, decayed))
    }
    def ranks(score: Map[String, Long]): Map[String, Long] =
      score.toSeq.sortBy { case (t, s) => (-s, t) }.zipWithIndex
        .map { case ((t, _), i) => t -> (i + 1L) }.toMap
    val rawR = ranks(byType.map { case (t, (n, _)) => t -> n }.toMap)
    val decR = ranks(byType.map { case (t, (_, d)) => t -> d }.toMap)
    val got = run("q168_decay_counts").collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    val truth = byType.map { case (t, (n, d)) =>
      t -> ((n, d, 1000L * d / (1024L * n), rawR(t), decR(t),
        rawR(t) - decR(t)))
    }.toMap
    assert(got === truth)
  }

  test("q195 chi-square algebra: marginal-consistent expecteds, contribs sum to the total") {
    val rows = run("q195_chi_square").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // full grid: |types| × |dows| cells, including zero-observed ones
    val types = rows.map(_._1).distinct
    val dows = rows.map(_._2).distinct
    assert(rows.length === types.length * dows.length, "grid must be complete")
    assert(rows.map(_._7).distinct === Array((types.length - 1L) * (dows.length - 1L)))
    val n = rows.map(_._3).sum
    val rm = rows.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._3).sum }
    val cm = rows.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._3).sum }
    rows.foreach { case (t, d, o, e3, c3, _, _) =>
      val expE = 1000L * rm(t) * cm(d) / n
      assert(e3 === expE, s"cell ($t,$d) expected")
      val dev = 1000L * o - expE
      assert(c3 === dev * dev / expE, s"cell ($t,$d) contribution")
    }
    assert(rows.map(_._6).distinct === Array(rows.map(_._5).sum),
      "chi2 total must equal the sum of all cell contributions")
  }

  test("q196 readout is internally consistent and rerun-stable") {
    val a = run("q196_ab_lift").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(a.keySet === Set(0L, 1L), "exactly two arms")
    a.foreach { case (_, (users, conv, rate, _, _)) =>
      assert(rate === 1000000L * conv / users)
      assert(conv <= users)
    }
    val lift = 1000000L * a(1L)._2 / a(1L)._1 - 1000000L * a(0L)._2 / a(0L)._1
    assert(a.values.map(_._4).toSeq.distinct === Seq(lift),
      "both rows carry the same cross-arm lift")
    // arm assignment is a pure hash: a rerun reproduces every cell
    val again = run("q196_ab_lift").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(again === a)
  }

  test("q202 CUSUM algebra: telescoping ends at zero, peak flags the |S| argmax") {
    val rows = run("q202_cusum_changepoint").collect().map(r =>
      (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (tpe, cells) =>
      val ordered = cells.sortBy(_._2)
      val nTot = ordered.map(_._3).sum
      val tCents = ordered.map(_._4).sum
      // replay s_cents_i = (N·Σcents − T·Σcnt) div N day by day in
      // BigInt (the banked form: wide internally, floored cents out)
      var (cumC, cumN) = (BigInt(0), BigInt(0))
      ordered.foreach { case (_, _, n, cents, s, _) =>
        cumC += cents; cumN += n
        val want = (BigInt(nTot) * cumC - BigInt(tCents) * cumN) / nTot
        assert(BigInt(s) === want, s"$tpe CUSUM cell")
      }
      // the final cumulative deviation telescopes to exactly zero
      assert(ordered.last._5 === 0L, s"$tpe must end at zero")
      // exactly one peak, and it is the earliest |S| argmax
      val peak = ordered.map(c => math.abs(c._5)).max
      assert(ordered.filter(_._6).map(_._2) ===
        Array(ordered.filter(c => math.abs(c._5) == peak).map(_._2).min),
        s"$tpe peak day")
    }
  }

  test("q204 division equals the brute-force all-quarters replay") {
    val orders = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey", "year(o_orderdate) AS y", "quarter(o_orderdate) AS q")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val truth = orders.filter(_._2 == 1995).groupBy(_._1)
      .filter { case (_, rs) => rs.map(_._3).distinct.length == 4 }
      .keySet
    val got = run("q204_relational_division").collect().map(_.getLong(0)).toSet
    assert(got === truth, s"got ${got.size}, truth ${truth.size}")
  }

  test("q205 lifecycle accounting: stages partition actives, churn balances the ledger") {
    val rows = run("q205_lifecycle").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    rows.foreach { case (wk, (active, nw, ret, res, _)) =>
      assert(active === nw + ret + res, s"week $wk stages must partition actives")
    }
    // churned-into(w) = active(w−1) − retained(w) wherever week w−1 exists
    rows.foreach { case (wk, (_, _, ret, _, _)) =>
      rows.get(wk - 1).foreach { case (prevActive, _, _, _, _) =>
        assert(rows(wk)._5 === prevActive - ret,
          s"week $wk churn ledger must balance")
      }
    }
  }

  test("q206 closed form equals the sequential clamp recurrence row for row") {
    val rows = run("q206_clamped_balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // replay b_i = max(0, b_{i-1} + delta) in ship order per part
    val src = graft.Tables.load(spark, sf, "lineitem")
      .filter(col("l_partkey") < 200)
      .selectExpr("l_partkey", "l_orderkey", "cast(l_linenumber as long)",
        "unix_micros(cast(l_shipdate as timestamp))",
        "case when l_returnflag = 'R' then cast(l_quantity as long)" +
          " else -cast(l_quantity as long) end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // (orderkey, linenumber) is NOT unique in this synthetic fixture
    // — 4 duplicate pairs with distinct shipdates at sf0.001 — so the
    // comparison is by sorted multiset, not by key
    val truth = src.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      var b = 0L
      rs.sortBy(r => (r._4, r._2, r._3)).map { case (pk, ok, ln, _, d) =>
        b = math.max(0L, b + d)
        (pk, ok, ln, d, b)
      }
    }.sorted
    val got = rows.map(r => (r._1, r._2, r._3, r._4, r._6)).toSeq.sorted
    assert(got === truth)
    // lost_demand is exactly what the clamp absorbed: balance - s
    rows.foreach { case (_, _, _, _, s0, b, lost) => assert(lost === b - s0) }
  }

  test("q207 merge statuses partition users; conflicts resolve latest-writer-wins") {
    val rows = run("q207_three_way_merge").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getBoolean(5)))
    val users = graft.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.length.toLong === users, "every user reconciles exactly once")
    // replay: route events by the same split arithmetic, pick latest per branch
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "cast(cast(value as decimal(18,4)) * 100 as long)",
        "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val split = ev.map(_._5 / 86400000000L).max - 2
    def branchOf(us: Long): String = {
      val day = us / 86400000000L
      if (day < split) "base" else if (day % 2 == 0) "a" else "b"
    }
    val latest = ev.groupBy(e => (e._1, branchOf(e._5))).map { case (k, es) =>
      k -> es.maxBy(e => (e._5, e._2))
    }
    rows.foreach { case (u, status, winner, mType, mCents, basePresent) =>
      val base = latest.get((u, "base")); val a = latest.get((u, "a"))
      val b = latest.get((u, "b"))
      assert(basePresent === base.isDefined)
      val expStatus = (a, b) match {
        case (None, None) => "base"
        case (Some(_), None) => "from_a"
        case (None, Some(_)) => "from_b"
        case _ => "conflict"
      }
      assert(status === expStatus, s"user $u status")
      val win = (a, b) match {
        case (None, None) => base.get
        case (Some(x), None) => x
        case (None, Some(y)) => y
        case (Some(x), Some(y)) =>
          if (x._5 > y._5 || (x._5 == y._5 && x._2 > y._2)) x else y
      }
      assert(mType === win._3 && mCents === win._4, s"user $u merged value")
      if (status == "conflict")
        assert(winner === (if (win == a.get) "a" else "b"), s"user $u winner")
    }
  }

  test("q208 credits sum to exactly 1000 per purchase; remainder lands on the latest touch") {
    val rows = run("q208_linear_attribution").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (pid, ts) =>
      assert(ts.map(_._4).sum === 1000L, s"purchase $pid credit must sum to 1000")
      val n = ts.head._3
      assert(ts.length.toLong === n, s"purchase $pid n_touches")
      // every touch gets floor(1000/n); exactly one absorbs the remainder
      val base = 1000L / n
      val rem = 1000L - n * base
      assert(ts.count(_._4 == base + rem) === (if (rem > 0) 1 else ts.length))
      assert(ts.forall(t => t._4 == base || t._4 == base + rem))
    }
  }

  test("q212 closed-form weekday count equals a literal day-by-day walk") {
    // W(x) closed form vs counting weekdays one day at a time
    def dow(d: Long): Long = (d + 4) % 7 // 0=Sun .. 6=Sat; day 0 is Thursday
    def wWalk(x: Long): Long = (0L until x).count(d => dow(d) >= 1 && dow(d) <= 5)
    val lut = Array(0L, 1L, 2L, 2L, 2L, 3L, 4L)
    def wClosed(x: Long): Long = 5 * (x / 7) + lut((x % 7).toInt)
    (0L to 400L).foreach(x => assert(wClosed(x) === wWalk(x), s"W($x)"))
    // and the aggregated report replays from collected rows
    val src = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("o_orderkey") === col("l_orderkey"))
      .selectExpr("year(l_shipdate) * 100 + month(l_shipdate)",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000",
        "unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2)))
    val truth = src.groupBy(_._1).map { case (m, rs) =>
      val bds = rs.map(r => wClosed(r._3) - wClosed(r._2))
      m -> ((rs.length.toLong, 1000L * bds.sum / rs.length, bds.max))
    }
    val got = run("q212_business_day_lag").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === truth)
  }

  test("q213 as-of state matches the q105 interval table under carry-forward") {
    val islands = run("q105_scd2_islands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val tAnchor = graft.Tables.load(spark, sf, "events")
      .agg(max(expr("unix_micros(ts)"))).head().getLong(0) - 86400000000L
    val truth = islands.filter(_._5 <= tAnchor).groupBy(_._1).map {
      case (u, is) =>
        val g = is.maxBy(_._5)
        (u, g._2, g._3, g._4, g._5, g._6, tAnchor <= g._6)
    }.toSet
    val got = run("q213_time_travel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(got === truth)
  }

  test("q214 kappa bounds and degenerate-case algebra hold") {
    val Array(row) = run("q214_cohens_kappa").collect()
    val (n, n11, n10, n01, n00, agree, kappa) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
      row.getLong(6))
    assert(n === n11 + n10 + n01 + n00, "2x2 table partitions the corpus")
    assert(agree === 1000L * (n11 + n00) / n)
    val pe = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert(kappa === 1000000L * (n * (n11 + n00) - pe) / (n * n - pe))
    assert(kappa <= 1000000L, "kappa is at most 1")
    // chance-corrected agreement is below raw agreement on this corpus
    assert(kappa < agree * 1000L)
  }

  test("q197 matches the brute-force CEP ground truth") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val truth = byUser.toSeq.flatMap { case (u, rows) =>
      val clicks = rows.filter(_._3 == "click")
      val errs = rows.filter(_._3 == "error").map(_._4)
      rows.filter(_._3 == "purchase").flatMap { case (_, pid, _, pUs) =>
        val cand = clicks.filter(c => c._4 < pUs && c._4 >= pUs - 1800000000L)
        if (cand.isEmpty) None
        else {
          val best = cand.maxBy(c => (c._4, c._2))
          if (errs.exists(e => e > best._4 && e < pUs)) None
          else Some((u, pid, best._2, (pUs - best._4) / 1000000L))
        }
      }
    }.toSet
    val got = run("q197_cep_pattern").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === truth, s"got ${got.size}, truth ${truth.size}")
  }
}
