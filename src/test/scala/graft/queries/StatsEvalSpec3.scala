package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** In-Scala replays for q260–q263 (the round-8 batch): Page's CUSUM
  * closed form against the literal max(0,·) recursion, the two-arm χ²
  * reduction against a direct floating computation, CUPED's algebraic
  * variance expansion against a per-user recomputation, and the
  * replication sweep's monotonicity — each recomputed independently
  * of the Spark plan AND the DuckDB oracle. */
class StatsEvalSpec3 extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q260
  test("q260 closed-form CUSUM equals the literal Page recursion") {
    val days = graft.Tables.load(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("d")).agg(count(lit(1)).as("x"))
      .orderBy("d").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val mu = days.take(14).map(_._2).sum / 14
    val k = mu / 20
    // the recursion the query's two-window closed form must equal
    var (su, sd) = (0L, 0L)
    val direct = days.map { case (d, x) =>
      su = math.max(0L, su + (x - (mu + k)))
      sd = math.max(0L, sd + ((mu - k) - x))
      (d, x, mu, su, sd, su > mu, sd > mu)
    }
    val got = run("q260_page_cusum_alarm").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
      .sortBy(_._1)
    assert(got.toSeq === direct.toSeq,
      "closed form S_t - min(0, min S_j) must equal max(0, ...) recursion")
  }

  // ---------------------------------------------------------------- q261
  test("q261 reduced chi-square equals the direct two-cell formula; only the bug flags") {
    val rows = run("q261_srm_check").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getBoolean(7))).toSeq
    assert(rows.length === 3)
    rows.foreach { case (scen, n, oa, wa, wb, chi2Milli, srm) =>
      val w = (wa + wb).toDouble
      val ea = n * wa / w
      val eb = n * wb / w
      val ob = n - oa
      val direct = math.pow(oa - ea, 2) / ea + math.pow(ob - eb, 2) / eb
      // the integer reduction floors at milli precision
      assert(math.abs(chi2Milli - math.floor(direct * 1000)) <= 1,
        s"$scen: reduced $chi2Milli vs direct ${direct * 1000}")
      assert(srm === (chi2Milli > 3841), s"$scen flag")
    }
    // POWER needs sample size: at sf0.001's ~15 users a 40/60 split is
    // genuinely not significant (χ² ≈ 0.6 < 3.841 — the test being
    // honest, not broken). The detection claim is asserted at sf0.01,
    // where the same bug clears the threshold decisively.
    val bySc = SparkEntry.queries("q261_srm_check")(
        spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> r.getBoolean(7)).toMap
    assert(bySc("mod_bug_50_50"), "the id-pattern bug must flag SRM at sf0.01")
    assert(!bySc("hash_50_50") && !bySc("hash_90_10"),
      "healthy assignments must not flag")
  }

  // ---------------------------------------------------------------- q262
  test("q262 algebraic variance expansion equals a per-user recomputation") {
    val ux = graft.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(dayofmonth(to_date(col("ts"))) <= 15, 1L).otherwise(0L)).as("x"),
        sum(when(dayofmonth(to_date(col("ts"))) > 15, 1L).otherwise(0L)).as("y"))
      .collect().map(r => (BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(ux.length)
    val sx = ux.map(_._1).sum; val sy = ux.map(_._2).sum
    val sxy = ux.map(t => t._1 * t._2).sum
    val sxx = ux.map(t => t._1 * t._1).sum
    val varX = n * sxx - sx * sx
    assert(varX > 0, "fixture must have pre-period variance")
    val theta = (BigInt(10000) * (n * sxy - sx * sy)) / varX
    // adjusted metric per user, then its n-scaled variance DIRECTLY
    val adj = ux.map { case (x, y) => BigInt(10000) * y - theta * x }
    val varAdjDirect = n * adj.map(a => a * a).sum - {
      val s = adj.sum; s * s
    }
    val varY = {
      val syy = ux.map(t => t._2 * t._2).sum; n * syy - sy * sy
    }
    val row = run("q262_cuped").collect().head
    assert(BigInt(row.getAs[Long]("theta_pq")) === theta, "theta")
    assert(BigInt(row.getAs[Long]("var_y_n")) === varY, "var_y")
    val ratioDirect = (BigInt(1000000) * varAdjDirect) /
      (BigInt(100000000) * varY)
    assert(BigInt(row.getAs[Long]("var_ratio_ppm")) === ratioDirect,
      "the no-second-pass algebraic expansion must equal the direct variance")
    assert(row.getAs[Long]("reduction_ppm") === 1000000L - ratioDirect.toLong)
  }

  // ---------------------------------------------------------------- q264
  test("q264 Shapley axioms: efficiency holds exactly; symmetry on a replayed game") {
    val rows = run("q264_shapley_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val (kfact, nConv, nOrg) = (rows.head._3, rows.head._4, rows.head._5)
    // efficiency: Σ φ_i = v(full) − v(∅), exactly, in k!-scaled integers
    assert(rows.map(_._2).sum === kfact * (nConv - nOrg),
      s"Σφ·k! must equal k!·(v_full − v_empty): $rows")
    // independent replay: rebuild the characteristic from per-user
    // channel sets and recompute φ by direct subset enumeration
    val ev = graft.Tables.load(spark, sf, "events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[String]("event_type")))
    val firstP = ev.filter(_._3 == "purchase").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2.getTime).min }
    val sets = firstP.map { case (u, pts) =>
      ev.filter(e => e._1 == u && e._3 != "purchase" && e._2.getTime < pts)
        .map(_._3).toSet
    }.toSeq
    val chans = sets.flatten.distinct.sorted
    val k = chans.length
    def v(s: Set[String]): Long = sets.count(_.subsetOf(s))
    def factL(n: Int): Long = (1 to n).map(_.toLong).product
    val phiDirect = chans.map { c =>
      val others = chans.filterNot(_ == c)
      val subsets = others.toSet.subsets().toSeq
      c -> subsets.map { sub =>
        factL(sub.size) * factL(k - sub.size - 1) *
          (v(sub + c) - v(sub))
      }.sum
    }.toMap
    rows.foreach { case (ch, phi, _, _, _) =>
      assert(phiDirect(ch) === phi, s"$ch: direct ${phiDirect(ch)} vs $phi")
    }
  }

  // ---------------------------------------------------------------- q265
  test("q265 ALS sweep: per-type SSE descends and factors replay from collected counts") {
    val rows = run("q265_rank1_als").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, _, improved) =>
      assert(improved, s"$t: one ALS sweep must not increase its SSE")
    }
    // independent replay of both closed-form solves in BigInt
    val r = graft.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("r"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val types = r.map(_._2).distinct.sorted
    val vden = BigInt(types.length) * BigInt(10000) * 10000
    val u = r.groupBy(_._1).map { case (uid, rs) =>
      uid -> (BigInt(100000000) * rs.map(x => BigInt(x._3) * 10000).sum / vden)
    }
    val uden = u.values.map(x => x * x).sum
    val vNew = types.map { t =>
      val rs = r.filter(_._2 == t)
      t -> (BigInt(100000000) * rs.map(x => BigInt(x._3) * u(x._1)).sum / uden)
    }.toMap
    rows.foreach { case (t, v, _) =>
      assert(vNew(t) === BigInt(v), s"$t: replay ${vNew(t)} vs $v")
    }
  }

  // ---------------------------------------------------------------- q266
  test("q266 BH gate replays step-up; positive control rejects at sf0.01") {
    // full procedure replay from the emitted chi2 column: rank by
    // (chi2 desc, type), threshold at the ladder rung (50·j) div m,
    // reject ranks 1..j* — must reproduce the query's own flags
    val ladder = Map(10L -> 6635L, 20L -> 5412L, 30L -> 4709L,
      40L -> 4218L, 50L -> 3841L)
    for (sfDir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = SparkEntry.queries("q266_fdr_gate")(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getBoolean(9)))
      val m = rows.length
      val sorted = rows.sortBy(r => (-r._2, r._1))
      sorted.zipWithIndex.foreach { case ((_, _, rank, qpm, _), i) =>
        assert(rank === i + 1L && qpm === (50L * (i + 1)) / m, "rank/rung")
      }
      val jstar = sorted.zipWithIndex
        .filter { case ((_, chi, _, qpm, _), _) => chi >= ladder(qpm) }
        .map(_._2 + 1).maxOption.getOrElse(0)
      sorted.zipWithIndex.foreach { case ((t, _, _, _, reject), i) =>
        assert(reject === (i + 1 <= jstar), s"$t reject flag")
      }
    }
    // power: the purchase-count test IS spend — it must reject once
    // the family has users (1500 at sf0.01); the nulls must not
    val big = SparkEntry.queries("q266_fdr_gate")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r.getBoolean(9)).toMap
    assert(big("purchase"), "positive control must reject at sf0.01")
    assert(!big("view") && !big("error"), "null metrics stay controlled")
  }

  // ---------------------------------------------------------------- q267
  test("q267 dispersion index replays var/mean over the FULL user grid") {
    val ev = graft.Tables.load(spark, sf, "events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct
    val rows = run("q267_dispersion_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    types.foreach { t =>
      // zero-count users are rows, not absences — dropping them
      // flatters D (the pinned contract)
      val xs = users.map(u => ev.count(e => e._1 == u && e._2 == t).toLong)
      val n = BigInt(xs.length); val sx = BigInt(xs.sum)
      val sxx = xs.map(x => BigInt(x) * x).sum
      val d = (BigInt(1000) * (n * sxx - sx * sx)) / ((n - 1) * sx)
      val (gn, gsx, gd) = rows(t)
      assert(gn === xs.length && BigInt(gsx) === sx && BigInt(gd) === d,
        s"$t: direct ($n, $sx, $d) vs ($gn, $gsx, $gd)")
    }
  }

  // ---------------------------------------------------------------- q268
  test("q268 threshold curve: tp/fp fall with k; k=4 equals q163's operating point") {
    val curve = run("q268_threshold_curve").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(curve.map(_._1) === (1L to 6L))
    // the predicted-positive set shrinks as k grows
    curve.sliding(2).foreach { case Array((_, (tp1, fp1, _)), (_, (tp2, fp2, _))) =>
      assert(tp2 <= tp1 && fp2 <= fp1, s"tp/fp must not grow with k: $curve")
    }
    // recall = tp/(tp+fn) with tp+fn constant → falls with tp
    // cross-point: q163 evaluates the SAME detector at n_match >= 4 on
    // the SAME sampled pair universe — its minhash row IS k=4
    val q163 = run("q163_neardup_eval").collect()
      .find(_.getString(0).startsWith("minhash")).get
    val (tp4, fp4, fn4) = curve(3)._2
    assert((q163.getLong(1), q163.getLong(2), q163.getLong(3)) ===
      ((tp4, fp4, fn4)), "q268 k=4 must equal q163's minhash confusion cells")
  }

  // ---------------------------------------------------------------- q269
  test("q269 OBF monitor: boundary ladder exact; confounded fires, hash never") {
    for (sfDir <- Seq(sf, "/root/testdata/sf0.01")) {
      val rows = SparkEntry.queries("q269_obf_monitor")(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5),
          r.getBoolean(6), r.getBoolean(7)))
      assert(rows.length === 10)
      // B_k = ceil(20802 / k): the K=5 OBF χ² ladder, conservative
      rows.foreach { case (_, k, _, b, _, _) =>
        assert(b === (20802 + k - 1) / k, s"boundary at look $k")
      }
      // stopped is the running OR of crossed, per scenario
      rows.groupBy(_._1).foreach { case (scen, rs) =>
        var fired = false
        rs.sortBy(_._2).foreach { case (_, k, chi, b, crossed, stopped) =>
          assert(crossed === (chi >= b), s"$scen look $k crossed")
          fired ||= crossed
          assert(stopped === fired, s"$scen look $k stopped")
        }
      }
    }
    // power at sf0.01+: the deliberately confounded arm must trip the
    // monitor; the salted-hash arm must survive every look (15 users
    // at sf0.001 genuinely cannot reach the early boundaries)
    val big = SparkEntry.queries("q269_obf_monitor")(
        spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getString(0) -> r.getBoolean(7))
    assert(big.filter(_._1 == "confounded").exists(_._2),
      "confounded assignment must stop early")
    assert(big.filter(_._1 == "hash").forall(!_._2),
      "healthy assignment must never stop")
  }

  // ---------------------------------------------------------------- q270
  test("q270 LOSO algebra equals literally re-aggregating without each source") {
    val docs = graft.Tables.load(spark, sf, "documents").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
      .map { case (src, txt) =>
        val hits = (txt.length - txt.replace(" the ", "").length) / 5
        (src, txt.length.toLong, hits.toLong)
      }
    val rows = run("q270_source_ablation").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    docs.map(_._1).distinct.foreach { s0 =>
      // the literal ablation: drop the source, re-aggregate
      val rest = docs.filterNot(_._1 == s0)
      val lenPm = 1000L * rest.map(_._2).sum / rest.length
      val engPpm = 1000000L * rest.map(_._3).sum / rest.map(_._2).sum
      assert(rows(s0) === ((lenPm, engPpm)),
        s"$s0: direct ($lenPm, $engPpm) vs ${rows(s0)}")
    }
  }

  // ---------------------------------------------------------------- q263
  test("q263 replication recall is monotone and consistent with q146's probe point") {
    val sweep = run("q263_replication_sweep").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sweep.keySet === Set(1L, 2L, 3L))
    // candidate cells only grow with r — recall cannot drop
    assert(sweep(1L) <= sweep(2L) && sweep(2L) <= sweep(3L),
      s"recall must not drop as replication widens: $sweep")
    // r=3 at nProbe=2 IS q146's nProbe=2 sweep point — same machinery
    // (ivfReplication = 3 is the default q146 sweeps at), same number
    val q146 = run("q146_recall_sweep").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sweep(3L) === q146(2L),
      s"q263 r=3 (${sweep(3L)}) must equal q146 nProbe=2 (${q146(2L)})")
  }
}
