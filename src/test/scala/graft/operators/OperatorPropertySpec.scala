package graft.operators

import graft.SparkSpec
import graft.functions.WinnowKernel
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized properties for the round-4 operators, seeded scalacheck
  * generators (the scalatest bridge artifact isn't available offline,
  * so sampling is driven manually, mirroring pipeline/PropertySpec). */
class OperatorPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---------------------------------------------------------------- RangeJoin

  private val intervalGen: Gen[(Long, Long, Long)] = for {
    id <- Gen.choose(0L, 1000000L)
    s <- Gen.choose(0L, 100000L)
    len <- Gen.choose(0L, 700L) // includes empty and bucket-straddling
  } yield (id, s, s + len)

  private val pointGen: Gen[(Long, Long)] = for {
    id <- Gen.choose(0L, 1000000L)
    t <- Gen.choose(-100L, 100700L) // includes out-of-range times
  } yield (id, t)

  test("RangeJoin == naive theta join on random intervals/points, any granularity") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val ivs = sample(Gen.listOfN(80, intervalGen), seed)
        .zipWithIndex.map { case ((_, s, e), i) => (i.toLong, s, e) }
      val pts = sample(Gen.listOfN(300, pointGen), seed + 100)
        .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
      val intervals = ivs.toDF("iid", "s_us", "e_us")
      val points = pts.toDF("pid", "t_us")
      val naive = ivs.flatMap { case (iid, s, e) =>
        pts.collect { case (pid, t) if t >= s && t < e => (iid, pid) }
      }.toSet
      for (bucket <- Seq(1L, 97L, 500L, 1000000L)) {
        val got = RangeJoin.pointInInterval(points, "t_us", intervals,
          "s_us", "e_us", bucket)
          .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length === got.distinct.length,
          s"seed=$seed bucket=$bucket emitted a duplicate pair")
        assert(got.toSet === naive, s"seed=$seed bucket=$bucket mismatch")
      }
    }
  }

  // ---------------------------------------------------------------- Winnow

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    // low-cardinality alphabet maximizes hash-tie and repeat coverage
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' '))
  } yield cs.mkString

  /** Direct (non-rolling, non-deque) reference winnow. */
  private def referenceWinnow(s: String, k: Int, w: Int): Option[Set[Long]] = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return None
    val hs = cps.sliding(k).map(g =>
      g.foldLeft(0L)((h, c) => (h * 257 + c) & 0xFFFFFFFFL)).toArray
    val wins =
      if (hs.length <= w) Seq(hs.min)
      else hs.sliding(w).map(_.min).toSeq
    Some(wins.toSet)
  }

  test("Winnow kernel == direct reference on random strings, several (k, w)") {
    for (seed <- 1L to 20L; (k, w) <- Seq((5, 4), (3, 2), (2, 7), (1, 1))) {
      val s = sample(textGen, seed * 31 + k * 7 + w)
      val got = Option(WinnowKernel.winnow(UTF8String.fromString(s), k, w))
        .map(_.toLongArray().toSet)
      assert(got === referenceWinnow(s, k, w), s"seed=$seed k=$k w=$w text='$s'")
    }
  }

  // ---------------------------------------------------------------- Ivf

  test("Ivf assignment argmin matches a naive per-row scan on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.choose(-50L, 50L))
    for (seed <- 1L to 2L) {
      val vecs = sample(Gen.listOfN(60, vecGen), seed)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = vecs.toDF("vec_id", "qv")
      val cents = Ivf.seedCentroids(df, "vec_id", "qv", 5)
      val centroids = cents.collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
      def naiveCell(v: Seq[Long]): Int =
        centroids.map { case (cid, cv) =>
          (v.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
        }.min._2
      val got = Ivf.assign(df, "qv", cents)
        .select("vec_id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toMap
      vecs.foreach { case (id, v) =>
        assert(got(id) === naiveCell(v), s"seed=$seed vec=$id")
      }
    }
  }

  // ---------------------------------------------------------------- BloomPrefilter

  test("BloomPrefilter never drops a member and passes few non-members, random key sets") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      val members = sample(Gen.listOfN(400,
        Gen.choose(Long.MinValue, Long.MaxValue)), seed).distinct
      val outsiders = sample(Gen.listOfN(2000,
        Gen.choose(Long.MinValue, Long.MaxValue)), seed + 7)
        .distinct.filterNot(members.toSet)
      val cfg = BloomPrefilter.Config(numBits = 1 << 14)
      val keys = members.toDF("k")
      val in = BloomPrefilter.prefilter(members.toDF("p"), "p", keys, "k", cfg)
      assert(in.count() === members.length.toLong,
        s"seed=$seed: a member failed the filter — broken no-false-negative contract")
      val fp = BloomPrefilter.prefilter(outsiders.toDF("p"), "p", keys, "k", cfg)
        .count().toDouble / outsiders.length
      // 400 keys × ≤3 bits in 2^14 bits → fill ≤ 7.3%, blocked-FP ≪ 5%
      assert(fp < 0.05, s"seed=$seed: FP rate $fp out of spec")
    }
  }

  // ---------------------------------------------------------------- CountMin

  test("CountMin never underestimates and conserves mass per row, random streams") {
    import spark.implicits._
    for (seed <- 1L to 3L) {
      // a skewed stream: few hot keys, a tail of rare ones
      val stream = sample(Gen.listOfN(3000, Gen.frequency(
        5 -> Gen.choose(0L, 5L), 3 -> Gen.choose(0L, 50L),
        2 -> Gen.choose(0L, 5000L))), seed).map(_.toString)
      val cfg = CountMin.Config(rows = 3, width = 64)
      val items = stream.toDF("k")
      val sketchRow = CountMin.build(items, "k", cfg)
      // each sketch row received every item exactly once
      val rowSums = sketchRow.selectExpr(
        (0 until cfg.rows).map(r =>
          s"aggregate(slice(__cm, ${r * cfg.width + 1}, ${cfg.width}), 0L, (a, x) -> a + x) AS s$r"): _*)
        .head()
      (0 until cfg.rows).foreach(r =>
        assert(rowSums.getLong(r) === stream.length.toLong,
          s"seed=$seed row $r lost mass"))
      // point estimates upper-bound the true counts
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ests = items.distinct()
        .crossJoin(broadcast(sketchRow))
        .select(col("k"), CountMin.estimate(col("k"), col("__cm"), cfg).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      ests.foreach { case (k, est) =>
        assert(est >= exact(k), s"seed=$seed key $k underestimated: $est < ${exact(k)}")
      }
    }
  }

  test("CountMin sketches merge exactly: build(A) + build(B) == build(A ++ B)") {
    import spark.implicits._
    val cfg = CountMin.Config(rows = 3, width = 64)
    val a = sample(Gen.listOfN(800, Gen.choose(0L, 200L)), 11L).map(_.toString)
    val b = sample(Gen.listOfN(700, Gen.choose(100L, 400L)), 12L).map(_.toString)
    val merged = CountMin.build(a.toDF("k"), "k", cfg).select(col("__cm").as("ca"))
      .crossJoin(CountMin.build(b.toDF("k"), "k", cfg).select(col("__cm").as("cb")))
      .select(CountMin.merge(col("ca"), col("cb")).as("__cm"))
      .head().getSeq[Long](0)
    val whole = CountMin.build((a ++ b).toDF("k"), "k", cfg)
      .head().getSeq[Long](0)
    assert(merged === whole)
  }

  // ---------------------------------------------------------------- CdcMerge

  private val changeGen: Gen[(Long, Long, Long, Double, Boolean)] = for {
    key <- Gen.choose(0L, 40L) // few keys → many per-key collisions
    ts <- Gen.choose(0L, 20L) // narrow → duplicate timestamps exercised
    seq <- Gen.choose(0L, 1000000L)
    v <- Gen.choose(0, 1000).map(_ / 10.0)
    del <- Gen.prob(0.25)
  } yield (key, ts, seq, v, del)

  test("CdcMerge: last-writer-wins replay on random logs with duplicate timestamps") {
    import spark.implicits._
    for (seed <- 21L to 23L) {
      val baseRows = sample(Gen.listOfN(60, changeGen), seed)
        .groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq // unique (key,ts,seq)
      val chgRows = sample(Gen.listOfN(60, changeGen), seed + 50)
        .groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
      def latest(xs: Seq[(Long, Long, Long, Double, Boolean)]) =
        xs.groupBy(_._1).map { case (k, g) => k -> g.maxBy(r => (r._2, r._3)) }
      val baseL = latest(baseRows); val chgL = latest(chgRows)
      val expected = (baseL.keySet ++ chgL.keySet).map { k =>
        (baseL.get(k), chgL.get(k)) match {
          case (Some(b), None) => (k, "kept", Option(b._4))
          case (Some(_), Some(c)) if c._5 => (k, "deleted", Option.empty[Double])
          case (None, Some(c)) if c._5 => (k, "noop_delete", Option.empty[Double])
          case (None, Some(c)) => (k, "inserted", Option(c._4))
          case (Some(_), Some(c)) => (k, "updated", Option(c._4))
          case (None, None) => sys.error("unreachable")
        }
      }
      val ordering = Seq(col("ts").desc, col("seq").desc)
      val base = CdcMerge.compact(
          baseRows.toDF("key", "ts", "seq", "v", "del"), Seq("key"), ordering)
        .select(col("key"), col("v").as("base_value"))
      val chg = CdcMerge.compact(
          chgRows.toDF("key", "ts", "seq", "v", "del"), Seq("key"), ordering)
        .select(col("key"), col("v").as("chg_value"),
          when(col("del"), "delete").otherwise("upsert").as("op"))
      val got = CdcMerge.merge(base, chg, "key", "base_value", "chg_value", "op")
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) Option.empty[Double] else Some(r.getDouble(2)))).toSet
      assert(got === expected, s"seed $seed")
    }
  }

  test("CdcMerge: change columns may collide with base column names") {
    import spark.implicits._
    // base carries extra columns named exactly like the change set's
    // op + value + passthrough columns — every reference must resolve
    // against its own side (the documented non-reserved-name contract)
    val base = Seq((1L, 10.0, "base-op", 0.0, "base-src"), (2L, 20.0, "base-op", 0.0, "base-src"))
      .toDF("key", "base_value", "op", "chg_value", "src")
    val chg = Seq((2L, 22.0, "upsert", "chg-src"), (3L, 33.0, "delete", "chg-src"))
      .toDF("key", "chg_value", "op", "src")
    val got = CdcMerge.merge(base, chg, "key", "base_value", "chg_value", "op")
      .select("key", "action", "final_value", "src")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getString(3))).toSet
    assert(got === Set(
      (1L, "kept", Some(10.0), null),
      (2L, "updated", Some(22.0), "chg-src"),
      (3L, "noop_delete", None, "chg-src")))
  }
}
