package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

import java.math.{BigDecimal => JBD, RoundingMode}

/** Independent in-Scala recomputation of the q215–q230 family — the
  * eval/stats/layout/graph operators added after the r06 gate. Each
  * test replays the query's exact integer semantics (decimal
  * quantization, floor division, fixed-point normalization) from the
  * raw sf0.001 tables and compares bit-for-bit, so a passing oracle
  * hash can't hide a shared-but-wrong formula on both engines. */
class StatsEvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** CAST(CAST(v AS DECIMAL(18,4)) * k AS BIGINT) replayed exactly:
    * half-up to 4 places, scale by k, truncate toward zero. */
  private def decScaled(v: Double, k: Long): Long =
    new JBD(v).setScale(4, RoundingMode.HALF_UP)
      .multiply(new JBD(k)).toBigInteger.longValueExact()

  private def floorDiv(a: Long, b: Long): Long = {
    // Spark `div` / DuckDB `//` truncate toward zero (verified on
    // negatives in the verify-skill notes) — replay that, not
    // Math.floorDiv.
    a / b
  }

  // ---------------------------------------------------------------- q215
  test("q215 AUC equals the brute-force pair count (wins + half-ties)") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("value"), col("event_type")).collect()
      .map(r => (decScaled(r.getDouble(0), 1000L), r.getString(1) == "purchase"))
    val pos = ev.filter(_._2).map(_._1)
    val neg = ev.filterNot(_._2).map(_._1)
    var wins = 0L; var ties = 0L
    for (p <- pos; n <- neg) {
      if (p > n) wins += 1 else if (p == n) ties += 1
    }
    val np = pos.length.toLong; val nn = neg.length.toLong
    val Array(row) = run("q215_auc_rank").collect()
    assert(row.getLong(0) === np)
    assert(row.getLong(1) === nn)
    val aucPpm = floorDiv(1000000L * (2 * wins + ties), 2 * np * nn)
    assert(row.getLong(2) === aucPpm, "rank-sum AUC != pair-count AUC")
    assert(row.getLong(3) ===
      floorDiv(1000000L * (2 * wins + ties), np * nn) - 1000000L)
  }

  // ---------------------------------------------------------------- q216
  test("q216 Nelson-Aalen replays from a subject-level simulation") {
    val fs = graft.Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey")
      .agg(expr("min(unix_micros(cast(l_shipdate as timestamp))" +
        " div 86400000000)").as("sd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val horizon = fs.values.max
    val subj = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey", "o_orderstatus",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
      .collect().map { r =>
        val shipped = r.getString(1) == "F" && fs.contains(r.getLong(0))
        val end = if (shipped) fs(r.getLong(0)) else horizon
        (end - r.getLong(2), if (shipped) 1L else 0L)
      }
    val total = subj.length.toLong
    val grid = subj.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, rs) => (d, rs.length.toLong, rs.map(_._2).sum) }
    var seen = 0L; var hazard = 0L
    val truth = grid.flatMap { case (d, nAt, dAt) =>
      val nRisk = total - seen
      seen += nAt
      if (dAt > 0) {
        hazard += floorDiv(1000000L * dAt, nRisk)
        Some((d, dAt, nRisk, hazard))
      } else None
    }
    val got = run("q216_nelson_aalen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq === truth)
    // hazard is nondecreasing and every risk set is positive
    assert(truth.sliding(2).forall(w => w.length < 2 || w(0)._4 <= w(1)._4))
    assert(truth.forall(_._3 > 0))
  }

  // ---------------------------------------------------------------- q217
  test("q217 Spearman replays from explicit tiebroken ranks") {
    val spend = graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => decScaled(r.getDouble(1), 100L)).sum
      }
    val cust = graft.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getDouble(2)))
    val truth = cust.groupBy(_._1).map { case (nation, rows) =>
      val rx = rows.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val ry = rows.sortBy(r => (spend.getOrElse(r._2, 0L), r._2)).zipWithIndex
        .map { case (r, i) => r._2 -> (i + 1L) }.toMap
      val n = rows.length.toLong
      // the banked form: Σd² and the quotient replay in BigInt (the
      // DECIMAL(38,0)/HUGEINT algebra — truncation toward zero)
      val d2 = rows.map(r => { val d = BigInt(rx(r._2) - ry(r._2)); d * d }).sum
      val rho = BigInt(1000000) -
        (BigInt(6000000) * d2) / (BigInt(n) * n * n - n)
      nation -> ((n, rho.toLong))
    }
    val got = run("q217_spearman").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === truth)
    // a rank correlation is bounded
    assert(got.values.forall(v => v._2 >= -1000000L && v._2 <= 1000000L))
  }

  // ---------------------------------------------------------------- q218
  test("q218 classes partition the customers and bound the modal share") {
    val rows = run("q218_l_diversity").collect()
    val nCust = graft.Tables.load(spark, sf, "customer").count()
    assert(rows.map(_.getLong(2)).sum === nCust, "classes partition")
    rows.foreach { r =>
      val (size, l, meets, share) =
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5))
      assert(l >= 1 && l <= 5, "at most 5 market segments")
      assert(l <= size)
      assert(meets === (l >= 3))
      // the modal share is at least the uniform share and at most 1
      assert(share >= 1000L / l && share <= 1000L)
    }
  }

  // ---------------------------------------------------------------- q219
  test("q219 HITS replays the four normalized reinforcement steps") {
    val pairs = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> floorDiv(v * 10000L, mx) }
    }
    val a1 = norm(pairs.groupBy(_._2).map { case (s, ps) =>
      s -> ps.length.toLong * 10000L
    })
    val h1 = norm(pairs.groupBy(_._1).map { case (c, ps) =>
      c -> ps.map(p => a1(p._2)).sum
    })
    val a2 = norm(pairs.groupBy(_._2).map { case (s, ps) =>
      s -> ps.map(p => h1(p._1)).sum
    })
    val h2 = norm(pairs.groupBy(_._1).map { case (c, ps) =>
      c -> ps.map(p => a2(p._2)).sum
    })
    val got = run("q219_hits").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val truth = a2.map { case (k, v) => ("auth", k) -> v } ++
      h2.map { case (k, v) => ("hub", k) -> v }
    assert(got === truth)
    // L-inf normalization: some node attains the cap on each side
    assert(got.filter(_._1._1 == "auth").values.max === 10000L)
    assert(got.filter(_._1._1 == "hub").values.max === 10000L)
  }

  // ---------------------------------------------------------------- q220
  test("q220 bins cover each month exactly and respect next-fit bounds") {
    val rows = run("q220_compaction_plan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val target = 1048576L
    val byMon = rows.groupBy(_._1)
    val files = graft.Tables.load(spark, sf, "lineitem")
      .groupBy(expr("year(l_shipdate) * 100 + month(l_shipdate)").as("mon"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0).toLong, 120L * r.getLong(2)))
    val monBytes = files.groupBy(_._1).map { case (m, fs) => m -> fs.map(_._2).sum }
    byMon.foreach { case (mon, bins) =>
      assert(bins.map(_._4).sum === monBytes(mon), s"month $mon coverage")
      val ideal = (monBytes(mon) + target - 1) / target
      assert(bins.forall(_._5 === ideal))
      assert(bins.length >= ideal.toInt, "next-fit can't beat the ideal")
      // bin ids are the dense running-offset quotients: contiguous
      val ids = bins.map(_._2).sorted
      assert(ids === (ids.min to ids.max), s"month $mon bins not contiguous")
    }
  }

  // ---------------------------------------------------------------- q221
  test("q221 Gini gains replay from raw counts; nonnegative; base shared") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_returnflag",
        "cast(cast(l_quantity as bigint) div 10 as string)",
        "cast(cast(round(l_discount * 100) as bigint) as string)",
        "l_linestatus", "cast(month(l_shipdate) as string)")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    val n = li.length.toLong
    val clsCounts = li.groupBy(_._1).map(_._2.length.toLong)
    val baseP = floorDiv(1000000L * (n * n - clsCounts.map(c => c * c).sum), n * n)
    def audit(pick: ((String, String, String, String, String)) => String) = {
      val byV = li.groupBy(pick)
      val wsum = byV.values.map { rs =>
        val nv = rs.length.toLong
        val s2 = rs.groupBy(_._1).map(_._2.length.toLong).map(c => c * c).sum
        nv * floorDiv(1000000L * (nv * nv - s2), nv * nv)
      }.sum
      (byV.size.toLong, floorDiv(wsum, n))
    }
    val truth = Map(
      "qty_band" -> audit(_._2), "disc_pct" -> audit(_._3),
      "linestatus" -> audit(_._4), "ship_month" -> audit(_._5))
    val got = run("q221_gini_impurity").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (f, (nv, base, weighted, gain)) =>
      assert(base === baseP, "all features share the label impurity")
      assert((nv, weighted) === truth(f))
      assert(gain === base - weighted)
      // splitting never increases Gini impurity beyond quantization:
      // each per-value term floors at most 1 ppm below the true value
      assert(gain >= -1L * nv)
    }
  }

  // ---------------------------------------------------------------- q222
  test("q222 drawdowns replay from a serial per-user scan") {
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts)", "event_id", "event_type",
        "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      var bal = 0L; var peak = Long.MinValue; var dd = Long.MinValue
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        val c = r._4 match {
          case "purchase" => decScaled(r._5, 100L)
          case "error" => -decScaled(r._5, 100L)
          case _ => 0L
        }
        bal += c
        peak = math.max(peak, bal)
        dd = math.max(dd, peak - bal)
      }
      (u, rows.length.toLong, peak, dd)
    }.toSeq
    val truth = perUser.sortBy(r => (-r._4, r._1)).take(20)
    val got = run("q222_max_drawdown").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === truth)
  }

  // ---------------------------------------------------------------- q223
  test("q223 census replays a direct classifier and counts all pairs") {
    val fs = graft.Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey")
      .agg(expr("min(unix_micros(cast(l_shipdate as timestamp))" +
        " div 86400000000)").as("sd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ords = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey", "o_orderkey",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
      .collect()
      .flatMap { r =>
        fs.get(r.getLong(1)).map(hi => (r.getLong(0), r.getLong(1),
          r.getLong(2), hi))
      }
    def rel(aLo: Long, aHi: Long, bLo: Long, bHi: Long): String =
      if (aHi < bLo) "before" else if (aHi == bLo) "meets"
      else if (bHi < aLo) "after" else if (bHi == aLo) "met_by"
      else if (aLo == bLo && aHi == bHi) "equals"
      else if (aLo == bLo && aHi < bHi) "starts"
      else if (aLo == bLo && aHi > bHi) "started_by"
      else if (aHi == bHi && aLo < bLo) "finished_by"
      else if (aHi == bHi && aLo > bLo) "finishes"
      else if (aLo < bLo && bHi < aHi) "contains"
      else if (aLo > bLo && aHi < bHi) "during"
      else if (aLo < bLo && bLo < aHi) "overlaps"
      else "overlapped_by"
    val truth = ords.groupBy(_._1).toSeq.flatMap { case (_, os) =>
      os.sortBy(o => (o._3, o._2)).sliding(2).collect {
        case Array(a, b) => rel(a._3, a._4, b._3, b._4)
      }
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = run("q223_allen_relations").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === truth)
    val nPairs = ords.groupBy(_._1).values.map(os => (os.length - 1).toLong).sum
    assert(got.values.sum === nPairs, "census counts every consecutive pair")
  }

  // ---------------------------------------------------------------- q224
  test("q224 modularity replays and degree identity holds") {
    val cu = graft.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val su = graft.Tables.load(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val pairs = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (cu(r.getLong(0)), su(r.getLong(1))))
    val m = pairs.length.toLong
    val nations = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val truth = nations.map { nat =>
      val eIn = pairs.count(p => p._1 == nat && p._2 == nat).toLong
      val dC = pairs.count(_._1 == nat).toLong + pairs.count(_._2 == nat).toLong
      nat -> ((eIn, dC,
        floorDiv(1000000L * eIn, m) - floorDiv(1000000L * dC * dC, 4 * m * m)))
    }.toMap
    val got = run("q224_modularity").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === truth)
    assert(got.values.map(_._2).sum === 2 * m, "sum of degrees = 2m")
    assert(got.values.map(_._1).sum <= m)
  }

  // ---------------------------------------------------------------- q225
  test("q225 MAP/MRR replays from a brute-force ranked list") {
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"),
        graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Long](2).toArray))
      .map { case (id, lab, qv) =>
        (id, lab, qv, qv.map(x => x * x).sum)
      }.filter(_._4 > 0)
    val queries = vecs.filter(_._1 < 20)
    val perq = queries.map { case (qid, qlab, qqv, qqn) =>
      val scored = vecs.filter(_._1 != qid).map { case (id, lab, qv, qn) =>
        val dot = qqv.zip(qv).map { case (a, b) => a * b }.sum
        (id, lab, dot.toDouble / math.sqrt(qqn.toDouble * qn.toDouble))
      }
      val top = scored.sortBy(r => (-r._3, r._1)).take(10)
      val rTotal = vecs.count(v => v._2 == qlab && v._1 != qid).toLong
      var hits = 0L; var apNum = 0L; var rr = 0L
      top.zipWithIndex.foreach { case ((_, lab, _), i) =>
        val rank = i + 1L
        if (lab == qlab) {
          hits += 1
          apNum += floorDiv(1000000L * hits, rank)
          if (rr == 0L) rr = floorDiv(1000000L, rank)
        }
      }
      val denom = math.min(rTotal, 10L)
      (qlab, rr, if (denom > 0) floorDiv(apNum, denom) else 0L)
    }
    val truth = perq.groupBy(_._1).map { case (lab, rs) =>
      lab -> ((rs.length.toLong,
        floorDiv(rs.map(_._2).sum, rs.length.toLong),
        floorDiv(rs.map(_._3).sum, rs.length.toLong)))
    }
    val got = run("q225_map_mrr").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === truth)
  }

  // ---------------------------------------------------------------- q226
  test("q226 cumulative-interval allocation equals a serial FIFO simulator") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_partkey", "l_linestatus", "cast(l_quantity as bigint)",
        "unix_micros(cast(l_shipdate as timestamp))", "l_orderkey",
        "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    val byPart = li.groupBy(_._1)
    val truth = byPart.map { case (pk, rows) =>
      val sup = rows.filter(_._2 == "F").sortBy(r => (r._4, r._5, r._6))
        .map(_._3).toBuffer
      val dem = rows.filter(_._2 == "O").sortBy(r => (r._4, r._5, r._6))
        .map(_._3)
      var allocated = 0L
      var si = 0
      var avail = if (sup.nonEmpty) sup(0) else 0L
      dem.foreach { q =>
        var need = q
        while (need > 0 && si < sup.length) {
          val take = math.min(need, avail)
          allocated += take; need -= take; avail -= take
          if (avail == 0) { si += 1; if (si < sup.length) avail = sup(si) }
        }
      }
      pk -> allocated
    }
    val got = run("q226_fifo_allocation").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))))
      .toMap
    // every part with supply appears; allocation matches the simulator
    truth.foreach { case (pk, alloc) =>
      got.get(pk) match {
        case Some((_, _, supply, demand, allocated, unfilled, leftover)) =>
          assert(allocated === alloc, s"part $pk FIFO mismatch")
          assert(unfilled === demand - allocated)
          assert(leftover === supply - allocated)
          assert(allocated <= math.min(supply, demand))
        case None =>
          // parts with demand but no supply are absent by contract
          assert(!li.exists(r => r._1 == pk && r._2 == "F"))
      }
    }
  }

  // ---------------------------------------------------------------- q227
  test("q227 run counts replay under both sort orders") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("year(l_shipdate) * 100 + month(l_shipdate)", "l_orderkey",
        "l_linenumber", "l_returnflag", "l_linestatus",
        "cast(cast(l_quantity as bigint) div 10 as string)")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getString(4), r.getString(5)))
    // both orders share the composite (rf, ls, qb) tiebreak the query
    // declares — one total order per pass for all three columns
    def runs(vOf: ((Int, Long, Int, String, String, String)) => String,
        clustered: Boolean): Long =
      li.groupBy(_._1).values.map { rows =>
        val sorted =
          if (clustered)
            rows.sortBy(r => (r._4, r._5, r._2, r._3, r._6))
          else rows.sortBy(r => (r._2, r._3, r._4, r._5, r._6))
        1L + sorted.sliding(2).count {
          case Array(a, b) => vOf(a) != vOf(b)
          case _ => false
        }
      }.sum
    val truth = Map(
      "returnflag" -> ((runs(_._4, false), runs(_._4, true))),
      "linestatus" -> ((runs(_._5, false), runs(_._5, true))),
      "qty_band" -> ((runs(_._6, false), runs(_._6, true))))
    val got = run("q227_rle_estimate").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    got.foreach { case (c, (n, rn, rc, ratio)) =>
      assert(n === li.length.toLong)
      assert((rn, rc) === truth(c), s"column $c run counts")
      assert(ratio === floorDiv(1000L * rc, rn))
      // clustering sorts on (rf, ls): runs for those two columns can
      // only shrink; qty_band rides along and may go either way
      if (c != "qty_band")
        assert(rc <= rn, s"clustering must not increase runs for $c")
    }
  }

  // ---------------------------------------------------------------- q228
  test("q228 distances replay 3 Bellman-Ford rounds") {
    val cnt = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = cnt.flatMap { case (c, s, n) =>
      val w = 1L + floorDiv(10000L, n)
      Seq((c, -(s + 1), w), (-(s + 1), c, w))
    }
    var dist = edges.map(_._1).filter(c => c >= 0 && c < 5).distinct
      .map(_ -> 0L).toMap
    (1 to 3).foreach { _ =>
      val relaxed = edges.flatMap { case (u, v, w) =>
        dist.get(u).map(d => v -> (d + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    val got = run("q228_shortest_paths").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist)
    // sources stay at zero; all distances nonnegative
    assert((0L until 5L).filter(got.contains).forall(got(_) === 0L))
    assert(got.values.forall(_ >= 0L))
  }

  // ---------------------------------------------------------------- q229
  test("q229 EMD replays; zero self-distance; dominated by diameter") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nAll = docs.length.toLong
    val grid = docs.map(_._2).distinct.sorted
    val cAll = grid.map(v => v -> docs.count(_._2 <= v).toLong).toMap
    val truth = docs.groupBy(_._1).map { case (src, ds) =>
      val nS = ds.length.toLong
      var emd = 0L
      grid.sliding(2).foreach {
        case Array(v, vNext) =>
          val cS = ds.count(_._2 <= v).toLong
          val gap = floorDiv(
            1000000L * math.abs(cS * nAll - cAll(v) * nS), nS * nAll)
          emd += (vNext - v) * gap
        case _ =>
      }
      src -> ((nS, emd))
    }
    val got = run("q229_emd_drift").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === truth)
    // EMD ≤ diameter × 10⁶ (all mass moved across the whole axis)
    val diam = grid.last - grid.head
    assert(got.values.forall(_._2 <= diam * 1000000L))
  }

  // ---------------------------------------------------------------- q230
  test("q230 bootstrap replays the hash weights and order statistics") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def weight(docId: Long, b: Long): Long = {
      val h = (((docId * 1000 + b + 9176) % 2147483648L) * 2654435761L) %
        4294967296L % 1000
      if (h < 368) 0L else if (h < 736) 1L else if (h < 920) 2L
      else if (h < 981) 3L else if (h < 996) 4L else 5L
    }
    val truth = docs.groupBy(_._1).map { case (src, ds) =>
      val means = (0L until 16L).map { b =>
        val ws = ds.map(d => (weight(d._2, b), d._3))
        val tw = ws.map(_._1).sum
        (if (tw == 0) 0L else floorDiv(1000L * ws.map(w => w._1 * w._2).sum, tw), b)
      }.sortBy(identity).map(_._1)
      val point = floorDiv(1000L * ds.map(_._3).sum, ds.length.toLong)
      src -> ((point, means(1), means(14)))
    }
    val got = run("q230_bootstrap_ci").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === truth)
    got.values.foreach { case (_, lo, hi) => assert(lo <= hi) }
  }
}
