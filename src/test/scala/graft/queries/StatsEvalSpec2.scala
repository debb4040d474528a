package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

import java.math.{BigDecimal => JBD, RoundingMode}

/** In-Scala replays for q231–q237 (the second post-r06 batch): kNN
  * LOOCV under cell blocking, Lorenz deciles, seasonal indexes,
  * cohort LTV, LIX readability, funnel order statistics, and the
  * Markov removal-effect sweeps — each recomputed independently with
  * the exact integer semantics both engines share. */
class StatsEvalSpec2 extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def cents(v: Double): Long =
    new JBD(v).setScale(4, RoundingMode.HALF_UP)
      .multiply(new JBD(100L)).toBigInteger.longValueExact()

  // ---------------------------------------------------------------- q231
  test("q231 confusion matrix replays cell-blocked 5-NN votes") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Long](2).toArray))
      .map { case (id, lab, qv) => (id, lab, qv, qv.map(x => x * x).sum) }
      .filter(_._4 > 0)
      .sortBy(_._1)
    val cents8 = vecs.take(8).map(_._3)
    def sqDist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
    def cellOf(qv: Array[Long]): Int =
      cents8.zipWithIndex.minBy { case (cv, i) => (sqDist(qv, cv), i) }._2
    val assigned = vecs.map { case (id, lab, qv, qn) =>
      (id, lab, qv, qn, cellOf(qv))
    }
    val byCell = assigned.groupBy(_._5)
    val truth = assigned.map { case (id, lab, qv, qn, cell) =>
      val top5 = byCell(cell).filter(_._1 != id)
        .map(b => (qn + b._4 - 2 * qv.zip(b._3).map(p => p._1 * p._2).sum,
          b._1, b._2))
        .sortBy(r => (r._1, r._2)).take(5)
      val pred = top5.groupBy(_._3).toSeq
        .map { case (l, vs) => (l, vs.length) }
        .minBy { case (l, v) => (-v, l) }._1
      (lab, pred)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = run("q231_knn_eval").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === truth)
    assert(got.values.sum === assigned.length.toLong,
      "every vector classifies exactly once")
  }

  // ---------------------------------------------------------------- q232
  test("q232 deciles replay; Lorenz curve is convex and ends at 1000") {
    val spend = graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(r => cents(r.getDouble(1))).sum }
    val ranked = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map(ck => (ck, spend.getOrElse(ck, 0L)))
      .sortBy { case (ck, c) => (c, ck) }
    val n = ranked.length.toLong
    val total = ranked.map(_._2).sum
    val truth = ranked.zipWithIndex
      .groupBy { case (_, i) => (10L * i) / n }
      .map { case (d, rows) =>
        d -> ((rows.length.toLong, rows.map(_._1._2).sum))
      }
    val got = run("q232_lorenz_deciles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    got.foreach { case (d, nc, cts, share, _) =>
      assert((nc, cts) === truth(d))
      assert(share === 1000L * cts / total)
    }
    // shares are nondecreasing by construction of the rank order
    assert(got.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    assert(got.last._5 === 1000L, "cumulative share must reach 1000")
  }

  // ---------------------------------------------------------------- q233
  test("q233 indexes replay; per-type weighted index averages to ~1") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "(unix_micros(ts) div 86400000000 + 4) % 7",
        "value").collect()
      .map(r => (r.getString(0), r.getLong(1), cents(r.getDouble(2))))
    val truth = ev.groupBy(r => (r._1, r._2)).map { case ((tpe, dow), rs) =>
      val (nT, cT) = {
        val all = ev.filter(_._1 == tpe)
        (all.length.toLong, all.map(_._3).sum)
      }
      val nD = rs.length.toLong
      val cD = rs.map(_._3).sum
      (tpe, dow) -> ((nD, cD, (1000L * cD * nT) / (nD * cT)))
    }
    val got = run("q233_seasonal_index").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === truth)
    // the count-weighted mean index per type is 1000 up to flooring
    got.groupBy(_._1._1).foreach { case (tpe, cells) =>
      val n = cells.values.map(_._1).sum
      val wsum = cells.values.map(c => c._1 * c._3).sum
      assert(math.abs(wsum / n - 1000L) <= 7L,
        s"$tpe weighted index ${wsum / n} strays from 1000")
    }
  }

  // ---------------------------------------------------------------- q234
  test("q234 LTV triangle replays; cumulative is nondecreasing") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 div 7",
        "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val w0 = ev.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val sz = w0.values.groupBy(identity).map { case (w, us) =>
      w -> us.size.toLong
    }
    val cr = ev.groupBy(r => (w0(r._1), r._2 - w0(r._1)))
      .map { case ((cw, age), rs) =>
        (cw, age) -> rs.filter(_._3 == "purchase").map(r => cents(r._4)).sum
      }
    val truth = cr.groupBy(_._1._1).flatMap { case (cw, cells) =>
      val sorted = cells.toSeq.sortBy(_._1._2)
      var cum = 0L
      sorted.map { case ((_, age), c) =>
        cum += c
        (cw, age) -> ((sz(cw), c, cum, cum / sz(cw)))
      }
    }
    val got = run("q234_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === truth)
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      val byAge = rows.toSeq.sortBy(_._1._2).map(_._2._3)
      assert(byAge.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        "cumulative revenue must be nondecreasing in age")
    }
  }

  // ---------------------------------------------------------------- q235
  test("q235 LIX and hapax replay through the same Java regexes") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def all(p: String, s: String): Seq[String] =
      p.r.findAllIn(s).toSeq
    val lix = docs.map { case (src, text) =>
      val w = all("[A-Za-z]+", text).length.toLong
      val sct = all("[.!?]", text).length.toLong
      val lw = all("[A-Za-z]{7,}", text).length.toLong
      (src, if (w == 0) 0L else 1000L * w / math.max(sct, 1L)
        + 100000L * lw / w)
    }
    val toks = docs.flatMap { case (src, text) =>
      all("[A-Za-z]+", text).map(t => (src, t))
    }
    val vocab = toks.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val truth = docs.map(_._1).distinct.map { src =>
      val l = lix.filter(_._1 == src)
      val tk = toks.filter(_._1 == src)
      val hap = tk.count(t => vocab(t._2) == 1L).toLong
      src -> ((l.length.toLong, l.map(_._2).sum / l.length,
        1000L * hap / tk.length))
    }.toMap
    val got = run("q235_readability").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === truth)
  }

  // ---------------------------------------------------------------- q236
  test("q236 latency order statistics replay from first-advance times") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val lats = byUser.toSeq.flatMap { case (u, rs) =>
      val v = rs.filter(_._2 == "view").map(_._3).minOption
      val c = v.flatMap(vu =>
        rs.filter(r => r._2 == "click" && r._3 > vu).map(_._3).minOption)
      val p = c.flatMap(cu =>
        rs.filter(r => r._2 == "purchase" && r._3 > cu).map(_._3).minOption)
      Seq(
        for (vu <- v; cu <- c) yield ("view>click", u, (cu - vu) / 1000000L),
        for (cu <- c; pu <- p)
          yield ("click>purchase", u, (pu - cu) / 1000000L)).flatten
    }
    def stat(step: String) = {
      val xs = lats.filter(_._1 == step).sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.length.toLong
      (n, xs(((n * 50 + 99) / 100 - 1).toInt),
        xs(((n * 90 + 99) / 100 - 1).toInt), xs.max)
    }
    val got = run("q236_funnel_latency").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map("view>click" -> stat("view>click"),
      "click>purchase" -> stat("click>purchase")))
    got.values.foreach { case (_, p50, p90, mx) =>
      assert(p50 <= p90 && p90 <= mx, "order statistics must order")
    }
  }

  // ---------------------------------------------------------------- q237
  test("q237 removal effects replay the 8 quantized Jacobi sweeps") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ordered = rs.sortBy(r => (r._4, r._2)).map(_._3)
      val cut = ordered.indexOf("purchase") match {
        case -1 => ordered
        case i => ordered.take(i + 1)
      }
      val start = Seq(("START", cut.head))
      val mids = cut.sliding(2).collect {
        case Array(a, b) if a != "purchase" => (a, b)
      }.toSeq
      val end =
        if (cut.last != "purchase") Seq((cut.last, "END")) else Seq.empty
      start ++ mids ++ end
    }
    val tc = trans.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val outs = trans.groupBy(_._1).map { case (s, v) => s -> v.length.toLong }
    def sweep(removed: Option[String]): Map[String, Long] = {
      var p = outs.keys.map(_ -> 0L).toMap
      (1 to 8).foreach { _ =>
        p = outs.keys.map { s =>
          val num = tc.collect {
            case ((s2, t), cnt) if s2 == s =>
              cnt * (t match {
                case "purchase" => 1000000L
                case "END" => 0L
                case x if removed.contains(x) => 0L
                case x => p.getOrElse(x, 0L)
              })
          }.sum
          s -> num / outs(s)
        }.toMap
      }
      p
    }
    val base = sweep(None)("START")
    val truth = Seq("view", "click", "signup").map { ch =>
      val rem = sweep(Some(ch))("START")
      ch -> ((base, rem,
        if (base > 0) 1000L * (base - rem) / base else 0L))
    }.toMap
    val got = run("q237_removal_effect").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === truth)
    // removing a touched channel cannot raise conversion
    got.values.foreach { case (b, r, eff) =>
      assert(r <= b, "removal cannot raise conversion probability")
      assert(eff >= 0L && eff <= 1000L)
    }
  }

  // ---------------------------------------------------------------- q238
  test("q238 chi-square and V-squared replay from the edge class table") {
    val pairs = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def log2c(d: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(d)
    val cd = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val sd = pairs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val cells = pairs.map(p => (log2c(cd(p._1)), log2c(sd(p._2))))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val m = pairs.length.toLong
    val rc = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val cc = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val chi2 = (for (r <- rc.keys; c <- cc.keys) yield {
      val e = 1000L * rc(r) * cc(c) / m
      if (e > 0) {
        val o = cells.getOrElse((r, c), 0L)
        (1000L * o - e) * (1000L * o - e) / (1000L * e)
      } else 0L
    }).sum
    val k = math.max(math.min(rc.size - 1, cc.size - 1).toLong, 1L)
    val Array(row) = run("q238_degree_mixing").collect()
    assert(row.getLong(0) === m)
    assert((row.getLong(1), row.getLong(2)) ===
      ((rc.size.toLong, cc.size.toLong)))
    assert(row.getLong(3) === chi2)
    assert(row.getLong(4) === 1000L * chi2 / (m * k))
  }

  // ---------------------------------------------------------------- q239
  test("q239 encodings replay and the leak gap has the right sign") {
    val o = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority")).collect()
      .map(r => (r.getString(0),
        if (r.getString(1) == "1-URGENT") 1L else 0L))
    val st = o.groupBy(_._1).map { case (seg, rs) =>
      seg -> ((rs.length.toLong, rs.map(_._2).sum))
    }
    val truth = o.groupBy(identity).map { case ((seg, y), rs) =>
      val (n, sSum) = st(seg)
      (seg, y) -> ((rs.length.toLong, 1000L * (sSum - y) / (n - 1),
        1000L * sSum / n))
    }
    val got = run("q239_target_encoding").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (k, (n, loo, naive, gap)) =>
      val (tn, tloo, tnaive) = truth(k)
      assert((n, loo, naive) === ((tn, tloo, tnaive)))
      assert(gap === loo - naive)
      // dropping an urgent row lowers the rate; dropping a non-urgent
      // row raises it (up to flooring)
      if (k._2 == 1L) assert(gap <= 0L) else assert(gap >= -1L)
    }
  }

  // ---------------------------------------------------------------- q240
  test("q240 offsets tile each shard exactly with one separator per doc") {
    val got = run("q240_packed_offsets").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(got.length.toLong === nDocs, "every doc gets an offset")
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._1)
      var off = 0L
      sorted.foreach { case (_, _, o, len, _) =>
        assert(o === off, s"shard $shard offsets must tile densely")
        off += len + 1
      }
      assert(rows.forall(_._5 === off),
        s"shard $shard total must equal the final offset")
      // the declared hash routing replays
      rows.foreach { case (id, sh, _, _, _) =>
        val h = ((id + 9176) % 2147483648L) * 2654435761L % 4294967296L % 8
        assert(sh === h)
      }
    }
  }

  // ---------------------------------------------------------------- q241
  test("q241 session counts replay per gap and are monotone in the gap") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts)", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def sessions(gapUs: Long): Long =
      ev.groupBy(_._1).values.map { rs =>
        val ts = rs.sortBy(r => (r._2, r._3)).map(_._2)
        1L + ts.sliding(2).count {
          case Array(a, b) => b - a > gapUs
          case _ => false
        }
      }.sum
    val got = run("q241_session_gap_sweep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(900L)._1 === sessions(900000000L))
    assert(got(1800L)._1 === sessions(1800000000L))
    assert(got(3600L)._1 === sessions(3600000000L))
    assert(got.values.map(_._2).toSet.size === 1, "event total is shared")
    // a larger gap can only merge sessions
    assert(got(900L)._1 >= got(1800L)._1 && got(1800L)._1 >= got(3600L)._1)
  }

  // ---------------------------------------------------------------- q242
  test("q242 header cells replay and partition the corpus") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val truth = docs.map { s0 =>
      val nb = s0.length.toLong
      val mime =
        if (nb % 3 == 0) "image/png"
        else if (nb % 3 == 1) "audio/wav" else "video/mp4"
      def b(i: Int): Long =
        if (s0.length > i) s0.charAt(i).toLong else 0L
      val w = b(0) * 256 + b(1); val h = b(2) * 256 + b(3)
      val aspect =
        if (w > h) "landscape" else if (w < h) "portrait" else "square"
      ((mime, aspect, w > 0 && h > 0 && w * h <= 8 * nb), nb)
    }.groupBy(_._1).map { case (k, v) =>
      k -> ((v.length.toLong, v.map(_._2).sum))
    }
    val got = run("q242_media_header_audit").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got === truth)
    assert(got.values.map(_._1).sum === docs.length.toLong)
  }

  // ---------------------------------------------------------------- q243
  test("q243 two-phase median equals the direct sorted order statistic") {
    val cents = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_extendedprice")).collect()
      .map(r => new JBD(r.getDouble(0)).setScale(4, RoundingMode.HALF_UP)
        .multiply(new JBD(100L)).toBigInteger.longValueExact())
      .sorted
    val n = cents.length.toLong
    val target = (n + 1) / 2
    val Array(row) = run("q243_exact_median").collect()
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === target)
    assert(row.getLong(4) === cents((target - 1).toInt),
      "two-phase median != direct kth smallest")
    // phase 2 touched only the located bucket
    assert(row.getLong(3) ===
      cents.count(_ / 100000L == row.getLong(2)).toLong)
  }

  // ---------------------------------------------------------------- q244
  test("q244 advisor replays counts; dims broadcast, facts at sf0.1 don't") {
    val got = run("q244_broadcast_advisor").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size === 10)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { tn =>
      val n = graft.Tables.load(spark, sf, tn).count()
      assert(got(tn)._1 === n, s"$tn count")
      assert(got(tn)._3 === (got(tn)._2 <= 10485760L))
    }
    assert(got("region")._3 && got("nation")._3,
      "pure dimensions stay broadcastable")
  }

  // ---------------------------------------------------------------- q245
  test("q245 flags exactly the restated month") {
    val maxMon = graft.Tables.load(spark, sf, "orders")
      .selectExpr("max(year(o_orderdate) * 100 + month(o_orderdate))")
      .head().getInt(0).toLong
    val got = run("q245_partition_diff").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length === 1, "exactly one partition changed")
    val (mon, nOld, nNew, changed) = got.head
    assert(mon === maxMon)
    assert(nOld === nNew, "a restatement changes values, not counts")
    assert(changed)
  }

  // ---------------------------------------------------------------- q246
  test("q246 estimates replay the uniform-frequency formula") {
    val orders = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey", "year(o_orderdate) * 100 + month(o_orderdate)")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    val liKeys = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val monOf = orders.toMap
    val nL = liKeys.length.toLong; val nO = orders.length.toLong
    val om = orders.groupBy(_._2).map { case (m, v) => m -> v.length.toLong }
    val act = liKeys.flatMap(monOf.get).groupBy(identity)
      .map { case (m, v) => m -> v.length.toLong }
    val got = run("q246_cardinality_audit").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === om.keySet)
    got.foreach { case (m, (no, est, actual, err)) =>
      assert(no === om(m))
      assert(est === no * nL / nO)
      assert(actual === act.getOrElse(m, 0L))
      if (actual > 0) assert(err === 1000L * (est - actual) / actual)
      else assert(err === 0L)
    }
  }

  // ---------------------------------------------------------------- q247
  test("q247 histogram accounts for every document exactly once") {
    val rows = run("q247_cluster_size_report").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._3).sum === nDocs, "sizes × clusters cover the corpus")
    rows.foreach { case (size, nc, docsAt, share) =>
      assert(docsAt === size * nc)
      assert(share === 1000L * docsAt / nDocs)
    }
  }

  // ---------------------------------------------------------------- q248
  test("q248 vacuum plan replays the keep-newest-3 policy") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts)", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val truth = ev.groupBy(_._2).map { case (tpe, rs) =>
      val del = rs.groupBy(_._1).values
        .map(g => math.max(0, g.length - 3).toLong).sum
      tpe -> ((rs.length.toLong, del))
    }
    val got = run("q248_retention_vacuum_plan").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (tpe, (n, del, bytes, share)) =>
      assert((n, del) === truth(tpe))
      assert(bytes === 96L * del)
      assert(share === 1000L * del / n)
    }
  }

  // ---------------------------------------------------------------- q249
  test("q249 routing table replays and fanout conserves rows") {
    val counts = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_suppkey")).collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = run("q249_salting_plan").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet === counts.keySet)
    got.foreach { case (k, (cnt, salts, salted)) =>
      assert(cnt === counts(k))
      assert(salts === (cnt + 255) / 256)
      assert(salted === (cnt > 256))
      // every salted partition holds ≤ target rows
      assert((cnt + salts - 1) / salts <= 256L)
    }
  }

  // ---------------------------------------------------------------- q250
  test("q250 incremental refresh is consistent for every month") {
    val rows = run("q250_incremental_join_view").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(7),
        s"month ${r.getLong(0)}: incremental ${r.getLong(5)} != " +
          s"direct ${r.getLong(6)}")
      assert(r.getLong(5) === r.getLong(1) + r.getLong(2) + r.getLong(3)
        + r.getLong(4))
    }
    // the deltas are non-trivial (the split actually moved rows)
    assert(rows.map(_.getLong(2)).sum > 0 && rows.map(_.getLong(3)).sum > 0)
  }

  // ---------------------------------------------------------------- q251
  test("q251 correlated estimate replays; key-sampling beats row-sampling") {
    def kh(x: Long, salt: Long): Long =
      ((x + salt) % 2147483648L) * 2654435761L % 4294967296L % 16
    val orders = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey", "year(o_orderdate) * 100 + month(o_orderdate)")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
      .filter(r => orders.contains(r._1))
    val act = li.groupBy(r => orders(r._1))
      .map { case (m, v) => m -> v.length.toLong }
    val corr = li.filter(r => kh(r._1, 9176L) == 0)
      .groupBy(r => orders(r._1))
      .map { case (m, v) => m -> 16L * v.length }
    val got = run("q251_sample_estimate").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got.keySet === act.keySet)
    got.foreach { case (m, (actual, estC, _, errC, _)) =>
      assert(actual === act(m))
      assert(estC === corr.getOrElse(m, 0L))
      assert(errC === 1000L * (estC - actual) / actual)
    }
    // aggregate quality: the correlated estimator lands far closer
    val mC = got.values.map(v => math.abs(v._4)).sum / got.size
    val mI = got.values.map(v => math.abs(v._5)).sum / got.size
    assert(mC < mI, s"correlated $mC pm must beat independent $mI pm")
  }

  // ---------------------------------------------------------------- q252
  test("q252 cascade replays exactly") {
    val vic = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .filter(_ % 97 == 0).toSet
    val vo = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .filter(r => vic(r.getLong(1))).map(_.getLong(0)).toSet
    val nl = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey")).collect().count(r => vo(r.getLong(0)))
    val got = run("q252_erasure_plan").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "customer" -> ((vic.size.toLong, 80L * vic.size)),
      "orders" -> ((vo.size.toLong, 88L * vo.size)),
      "lineitem" -> ((nl.toLong, 120L * nl))))
  }

  // ---------------------------------------------------------------- q253
  test("q253 reliability table replays; ECE aggregates the bins") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("value"), col("event_type")).collect()
      .map(r => (new JBD(r.getDouble(0)).setScale(4, RoundingMode.HALF_UP)
        .multiply(new JBD(10000L)).toBigInteger.longValueExact(),
        if (r.getString(1) == "purchase") 1L else 0L))
    val g = ev.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (sc, rs) => (sc, rs.length.toLong, rs.map(_._2).sum) }
    val n = ev.length.toLong
    var cum = 0L
    val bins = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    g.foreach { case (_, nG, posG) =>
      cum += nG
      val pHat = 1000L * (cum - (nG + 1) / 2) / n
      val bin = math.min(pHat / 100, 9L)
      val (nb, ps, po) = bins.getOrElse(bin, (0L, 0L, 0L))
      bins(bin) = (nb + nG, ps + nG * pHat, po + posG)
    }
    val ece = bins.values.map { case (nb, ps, po) =>
      nb * math.abs(ps / nb - 1000L * po / nb)
    }.sum / bins.values.map(_._1).sum
    val got = run("q253_calibration_ece").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === bins.keySet)
    got.foreach { case (bin, (nb, pred, obs, gap, e)) =>
      val (tn, ps, po) = bins(bin)
      assert(nb === tn)
      assert(pred === ps / tn)
      assert(obs === 1000L * po / tn)
      assert(gap === math.abs(pred - obs))
      assert(e === ece)
    }
  }

  // ---------------------------------------------------------------- q254
  test("q254 weighted median replays a serial cumulative-weight scan") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_returnflag",
        "cast(cast(l_extendedprice as decimal(18,4)) * 100 as bigint)",
        "cast(l_quantity as bigint)", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    val truth = li.groupBy(_._1).map { case (rf, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4, r._5))
      val tw = rows.map(_._3).sum
      var cw = 0L
      val med = sorted.find { r => cw += r._3; cw >= (tw + 1) / 2 }.get._2
      rf -> ((tw, med))
    }
    val got = run("q254_weighted_median").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === truth)
  }

  // ---------------------------------------------------------------- q255
  test("q255 rolling WAU replays a direct 7-day set union") {
    val ud = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) div 86400000000").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val dmin = ud.map(_._2).min; val dmax = ud.map(_._2).max
    val truth = (dmin + 6 to dmax).map { d =>
      val win = ud.filter(r => r._2 >= d - 6 && r._2 <= d)
      val wau = win.map(_._1).distinct.length.toLong
      val dau = ud.filter(_._2 == d).length.toLong
      d -> ((dau, wau, 1000L * dau / wau))
    }.toMap
    val got = run("q255_rolling_wau").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === truth)
    // WAU dominates DAU by construction
    assert(got.values.forall(v => v._2 >= v._1))
  }

  // ---------------------------------------------------------------- q256
  test("q256 closed-form leftovers equal the q226 simulator's") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_partkey", "l_linestatus", "cast(l_quantity as bigint)",
        "unix_micros(cast(l_shipdate as timestamp)) div 86400000000",
        "unix_micros(cast(l_shipdate as timestamp))", "l_orderkey",
        "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    val horizon = li.map(_._4).max
    // serial FIFO: consume lots oldest-first; whatever remains is the
    // leftover this query buckets by age
    val buckets = scala.collection.mutable.Map[Long, (Long, Long)]()
    li.groupBy(_._1).foreach { case (_, rows) =>
      val sup = rows.filter(_._2 == "F").sortBy(r => (r._5, r._6, r._7))
      var demand = rows.filter(_._2 == "O").map(_._3).sum
      sup.foreach { lot =>
        val consumed = math.min(lot._3, demand)
        demand -= consumed
        val left = lot._3 - consumed
        if (left > 0) {
          val b = (horizon - lot._4) / 30
          val (n, q) = buckets.getOrElse(b, (0L, 0L))
          buckets(b) = (n + 1, q + left)
        }
      }
    }
    val got = run("q256_stock_aging").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === buckets.toMap)
  }

  // ---------------------------------------------------------------- q257
  test("q257 overlap matrix replays exact set algebra") {
    val ut = graft.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val sets = ut.groupBy(_._2).map { case (t0, v) => t0 -> v.map(_._1).toSet }
    val types = sets.keys.toSeq.sorted
    val truth = (for {
      i <- types.indices; j <- i + 1 until types.length
    } yield {
      val (a, b) = (types(i), types(j))
      val both = (sets(a) & sets(b)).size.toLong
      val (na, nb) = (sets(a).size.toLong, sets(b).size.toLong)
      (a, b) -> ((na, nb, both, 1000L * both / (na + nb - both),
        1000L * both / math.min(na, nb)))
    }).toMap
    val got = run("q257_segment_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got === truth)
  }

  // ---------------------------------------------------------------- q258
  test("q258 duplicate pairs replay; each first-payment reports once") {
    val p = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id", "event_id", "value", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        new JBD(r.getDouble(2)).setScale(4, RoundingMode.HALF_UP)
          .multiply(new JBD(100L)).toBigInteger.longValueExact() / 100,
        r.getLong(3)))
    val truth = p.groupBy(r => (r._1, r._3)).values.flatMap { g =>
      g.flatMap { a =>
        val later = g.filter(b =>
          (b._4 > a._4 || (b._4 == a._4 && b._2 > a._2)) &&
            b._4 - a._4 <= 86400000000L)
        if (later.isEmpty) None
        else {
          val b = later.minBy(x => (x._4 - a._4, x._2))
          Some((a._1, a._2, b._2, a._3, (b._4 - a._4) / 60000000L))
        }
      }
    }.toSet
    val got = run("q258_duplicate_payments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === truth)
    // canonical: each first payment appears at most once
    assert(got.toSeq.map(r => (r._1, r._2)).distinct.length === got.size)
  }
}
