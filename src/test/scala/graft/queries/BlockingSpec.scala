package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Semantic pins for the round-13 blocking/pruning family that the
  * oracle hash alone cannot express: q299's prefix filter is LOSSLESS
  * and actually prunes (candidates ⊊ gram-sharing pairs); q300's
  * MaxScore result equals exhaustive integer-exact BM25 pick for
  * pick; q301's window pairs respect the sorted-neighborhood
  * contract. All brute forces replay the exact arithmetic (md5-free
  * raw gram sets for Jaccard — md5 only relabels set elements;
  * DECIMAL(18,4) HALF_UP for BM25).
  */
class BlockingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def docs: Map[Long, String] =
    graft.Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Distinct word-5-gram set per doc (raw strings; q299 hashes them
    * with md5, which only relabels elements — identical set algebra). */
  private def grams5(text: String): Set[String] = {
    val tk = text.split(" ", -1)
    if (tk.length < 5) Set.empty
    else (0 to tk.length - 5).map(i => tk.slice(i, i + 5).mkString(" ")).toSet
  }

  test("q299 equals the brute-force exact Jaccard-0.7 self-join") {
    val sets = docs.map { case (id, t) => id -> grams5(t) }
      .filter(_._2.nonEmpty)
    val ids = sets.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      c = (sets(a) & sets(b)).size
      if 17L * c >= 7L * (sets(a).size + sets(b).size)
    } yield (a, b, c.toLong)).toSet
    val got = run("q299_prefix_jaccard_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth, s"got ${got.size} pairs, truth ${truth.size}")
    assert(truth.nonEmpty, "fixture must exercise the join")
  }

  test("q299 prefix filter is lossless and strictly prunes the candidate space") {
    val sets = docs.map { case (id, t) => id -> grams5(t) }
      .filter(_._2.nonEmpty)
    // global order = (corpus df ASC, gram ASC), exactly the query's
    val df = sets.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    def prefix(s: Set[String]): Set[String] = {
      val p = s.size - (7 * s.size + 9) / 10 + 1
      s.toSeq.sortBy(g => (df(g), g)).take(p).toSet
    }
    val pre = sets.map { case (id, s) => id -> prefix(s) }
    val ids = sets.keys.toSeq.sorted
    var sharingAny = 0L
    var sharingPrefix = 0L
    for {
      i <- ids.indices
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
    } {
      val inter = sets(a) & sets(b)
      if (inter.nonEmpty) sharingAny += 1
      if ((pre(a) & pre(b)).nonEmpty) sharingPrefix += 1
      // losslessness: every qualifying pair shares a prefix gram
      if (17L * inter.size >= 7L * (sets(a).size + sets(b).size))
        assert((pre(a) & pre(b)).nonEmpty, s"pair ($a,$b) escaped the prefix filter")
    }
    assert(sharingPrefix < sharingAny,
      s"prefix filter must prune: $sharingPrefix candidates vs $sharingAny gram-sharing pairs")
  }

  /** Exhaustive integer-exact BM25 replay (q90/q300 arithmetic). */
  private def bm25Truth(qTerms: Seq[(Int, String)], k: Int): Set[(Int, Long, Double, Long)] = {
    val bigrams = docs.map { case (id, t) =>
      val tk = t.split(" ", -1)
      id -> tk.indices.dropRight(1).map(i => tk(i) + " " + tk(i + 1))
    }
    // mirror the engines' "GROUP BY doc_id over big" derivation: docs
    // that produce no bigram (< 2 tokens) contribute to neither dl nor
    // the corpus stats, so drop them before computing n / tTot / df
    val withBigrams = bigrams.filter { case (_, g) => g.nonEmpty }
    val dl = withBigrams.map { case (id, g) => id -> g.size.toLong }
    val n = dl.size.toLong
    val tTot = dl.values.sum
    val dfMap = withBigrams.values.flatMap(_.distinct).groupBy(identity)
      .map { case (g, o) => g -> o.size.toLong }
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    qTerms.groupBy(_._1).flatMap { case (qid, terms) =>
      val perDoc = withBigrams.toSeq.flatMap { case (id, gs) =>
        terms.flatMap { case (_, term) =>
          val tf = gs.count(_ == term).toLong
          if (tf == 0) None
          else {
            val dfT = dfMap(term)
            val idf2 = bitlen(2 * (n - dfT) + 1) - bitlen(2 * dfT + 1)
            val raw = (idf2 * 22 * tTot * tf).toDouble /
              (10 * tTot * tf + 3 * tTot + 9 * dl(id) * n).toDouble
            Some(id -> BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP))
          }
        }
      }
      perDoc.groupBy(_._1).toSeq
        .map { case (id, xs) => (id, xs.map(_._2).sum.toDouble) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, (i + 1).toLong) }
    }.toSet
  }

  test("q300 MaxScore result equals exhaustive BM25, pick for pick") {
    val qTerms = Seq((1, "hash dup"), (1, "table hash"), (1, "merge group"),
      (2, "big dup"), (2, "slow key"), (2, "part filter"))
    val truth = bm25Truth(qTerms, 10)
    val got = run("q300_maxscore_bm25").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got === truth, s"got ${got.size} rows, truth ${truth.size}")
    assert(truth.size === 20, "both queries must fill their top-10")
  }

  test("q301 pairs respect the block/window contract and the kernel threshold") {
    val rows = run("q301_sorted_neighborhood").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    // brute-force SNM replay: block by 8-char prefix, sort by (text, id)
    val byBlock = docs.toSeq.filter(_._2.length >= 3)
      .groupBy { case (_, t) => t.take(8) }
    val truth = byBlock.values.flatMap { blk =>
      val sorted = blk.sortBy { case (id, t) => (t, id) }
      for {
        i <- sorted.indices
        j <- (i + 1) until math.min(i + 5, sorted.length)
      } yield {
        val (ia, ta) = sorted(i); val (ib, tb) = sorted(j)
        val sa = ta.sliding(3).toSet
        val sb = tb.sliding(3).toSet
        val c = (sa & sb).size.toLong
        val jac = c.toDouble / (sa.size + sb.size - c)
        (ia, ib, c, jac, jac >= 0.7)
      }
    }.toSet
    assert(rows.toSet === truth, s"got ${rows.length} pairs, truth ${truth.size}")
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "fixture must exercise both dup and non-dup window pairs")
  }

  test("q302 equals the brute-force batch×archive exact Jaccard join") {
    val sets = docs.map { case (id, t) => id -> grams5(t) }
      .filter(_._2.nonEmpty)
    val truth = (for {
      (a, sa) <- sets.iterator if a % 10 == 0
      (b, sb) <- sets.iterator if b % 10 != 0
      c = (sa & sb).size
      if 17L * c >= 7L * (sa.size + sb.size)
    } yield (a, b, c.toLong)).toSet
    val got = run("q302_incremental_prefix_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth, s"got ${got.size} pairs, truth ${truth.size}")
    assert(truth.nonEmpty, "fixture must exercise the incremental join")
  }

  test("q303 phrase matches equal the dominant trigram's occurrences, doc for doc") {
    // brute force: count trigram occurrences per doc, pick the global
    // top-1 under (count DESC, trigram ASC), compare doc-level counts
    // and first positions against the positional-join output
    val occ = docs.toSeq.flatMap { case (id, t) =>
      val tk = t.split(" ", -1)
      (0 to tk.length - 3).map(i =>
        (tk.slice(i, i + 3).mkString(" "), id, i + 1L))
    }
    val top = occ.groupBy(_._1).toSeq
      .map { case (g, o) => (g, o.size) }
      .minBy { case (g, n) => (-n, g) }._1
    val truth = occ.filter(_._1 == top).groupBy(_._2)
      .map { case (id, o) =>
        (id, o.size.toLong, o.map(_._3).min)
      }.toSet
    val got = run("q303_phrase_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth, s"got ${got.size} docs, truth ${truth.size}")
    assert(truth.nonEmpty, "fixture must have a dominant trigram")
  }

  test("q304 proximity pairs equal the brute-force window scan") {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }
    val counts = toks.values.flatten.groupBy(identity)
      .map { case (w, o) => w -> o.size }
    val Seq(w1, w2) = counts.toSeq.sortBy { case (w, n) => (-n, w) }
      .take(2).map(_._1)
    val truth = toks.toSeq.flatMap { case (id, tk) =>
      val spans = for {
        i <- tk.indices if tk(i) == w1
        j <- tk.indices if tk(j) == w2
        d = math.abs(j - i) if d >= 1 && d <= 3
      } yield d.toLong
      if (spans.isEmpty) None
      else Some((id, spans.size.toLong, spans.min))
    }.toSet
    val got = run("q304_proximity_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === truth, s"got ${got.size} docs, truth ${truth.size}")
    assert(truth.nonEmpty, "fixture must exercise the proximity window")
  }

  test("q307 groups equal true connected components of the exact pair graph") {
    val sets = docs.map { case (id, t) => id -> grams5(t) }
      .filter(_._2.nonEmpty)
    val ids = sets.keys.toSeq.sorted
    val pairs = for {
      i <- ids.indices
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      c = (sets(a) & sets(b)).size
      if 17L * c >= 7L * (sets(a).size + sets(b).size)
    } yield (a, b)
    // union-find ground truth (full convergence, not 3 rounds): the
    // test witnesses that 3 min-label rounds SUFFICE on this fixture
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val truth = members.map(v => (v, find(v))).toSet
    val got = run("q307_exact_dedup_groups").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth, s"got ${got.size} rows, truth ${truth.size}")
    assert(truth.exists { case (v, g) => v != g }, "fixture must have real groups")
  }

  test("q306 noise replays the trailing-zero geometric difference; release is consistent") {
    def knuth(x: Long, salt: Long): Long =
      (((x + salt) % 2147483648L) * 2654435761L) % 4294967296L
    def ctz(h: Long): Long =
      if (h == 0) 20L else java.lang.Long.numberOfTrailingZeros(h).toLong
    val exact = graft.Tables.load(spark, sf, "customer")
      .groupBy("c_nationkey").count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    val rows = run("q306_dp_noisy_release").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length === exact.size, "one release row per group")
    rows.foreach { case (nation, noisy, noise, eps) =>
      val expect = ctz(knuth(nation, 577L) % 1048576L) -
        ctz(knuth(nation, 9241L) % 1048576L)
      assert(noise === expect, s"nation $nation noise")
      assert(noisy - noise === exact(nation), s"nation $nation consistency")
      assert(math.abs(noise) <= 20 && eps === 693L)
    }
    assert(rows.exists(_._3 != 0L), "fixture must draw some nonzero noise")
  }

  test("q308 tau bounds and pair accounting hold; self-agreement is perfect") {
    val rows = run("q308_rank_agreement").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === 3, "one row per q90 query")
    rows.foreach { case (q, n, c, d, tau) =>
      assert(c + d === n * (n - 1) / 2, s"query $q: every pair concordant xor discordant")
      assert(tau >= -1000 && tau <= 1000, s"query $q: tau in [-1, 1]")
      assert(tau === 1000L * (c - d) / (c + d), s"query $q: tau arithmetic")
    }
    // BM25 and raw TF genuinely disagree somewhere on this corpus
    // (dl-normalization reorders) — the metric is not vacuous
    assert(rows.exists(_._5 < 1000), "some query must show disagreement")
  }

  // ------------------------------------------------------------------
  // Randomized property pins for the blocking MATH itself (pure set
  // algebra — no Spark): the fixed-fixture tests above witness one
  // corpus; these fence the theorem classes across random universes
  // and thresholds, so a future edit to the prefix-length or
  // essential-set arithmetic cannot pass the fixture by luck.

  test("property: prefix filter is lossless for random set universes and thresholds") {
    val rng = new scala.util.Random(20260816L)
    for (trial <- 1 to 60) {
      val thr = (2 + rng.nextInt(8)) * 10 // t = thr/100 ∈ {0.2 … 0.9}
      val vocab = (0 until (20 + rng.nextInt(60))).map(i => f"g$i%03d")
      val sets = (0 until (15 + rng.nextInt(25))).map { id =>
        id -> rng.shuffle(vocab).take(3 + rng.nextInt(vocab.size - 3)).toSet
      }.toMap
      val df = sets.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
      // prefix length for Jaccard ≥ t = thr/100: sz − ⌈t·sz⌉ + 1
      def prefix(s: Set[String]): Set[String] = {
        val p = s.size - (thr * s.size + 99) / 100 + 1
        s.toSeq.sortBy(g => (df(g), g)).take(p).toSet
      }
      val pre = sets.map { case (id, s) => id -> prefix(s) }
      val ids = sets.keys.toSeq.sorted
      for {
        i <- ids.indices
        j <- (i + 1) until ids.length
        a = ids(i); b = ids(j)
        c = (sets(a) & sets(b)).size
        // qualifying ⟺ c/(|a|+|b|−c) ≥ thr/100 ⟺ (100+thr)·c ≥ thr·(|a|+|b|)
        if (100L + thr) * c >= thr.toLong * (sets(a).size + sets(b).size)
      } assert((pre(a) & pre(b)).nonEmpty,
        s"trial $trial t=$thr%: qualifying pair ($a,$b) escaped the prefix filter")
    }
  }

  test("property: MaxScore essential-set pruning never changes the top-k") {
    val rng = new scala.util.Random(20260817L)
    for (trial <- 1 to 60) {
      val k = 1 + rng.nextInt(5)
      val nTerms = 2 + rng.nextInt(5)
      val nDocs = 5 + rng.nextInt(40)
      // sparse random score matrix: term t matches doc d with score in ‰
      val scores: Map[(Int, Int), Long] = (for {
        t <- 0 until nTerms
        d <- 0 until nDocs
        if rng.nextInt(100) < 35
      } yield (t, d) -> (1L + rng.nextInt(5000))).toMap
      val byDoc = scores.groupBy(_._1._2).map { case (d, m) => d -> m.values.sum }
      val exhaustive = byDoc.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
      // the q300 algebra: ub per term; seed = term with most matches
      // (df ≥ k preferred), θ = k-th best full score over seed docs
      val ub = (0 until nTerms).map(t =>
        t -> scores.collect { case ((tt, _), s) if tt == t => s }
          .foldLeft(0L)(math.max)).toMap
      val dfT = (0 until nTerms).map(t =>
        t -> scores.keys.count(_._1 == t)).toMap
      val seed = (0 until nTerms).minBy(t => (if (dfT(t) >= k) 0 else 1, -ub(t), t))
      val seedDocs = scores.keys.collect { case (t, d) if t == seed => d }.toSet
      val seedTop = seedDocs.toSeq.map(d => d -> byDoc(d))
        .sortBy { case (d, s) => (-s, d) }
      val theta: Option[Long] =
        if (seedTop.size >= k) Some(seedTop(k - 1)._2) else None
      val nonEss: Set[Int] = theta match {
        case None => Set.empty
        case Some(th) =>
          val asc = (0 until nTerms).sortBy(t => (ub(t), t))
          val cums = asc.scanLeft(0L) { case (c, t) => c + ub(t) }.tail
          asc.zip(cums).takeWhile(_._2 < th).map(_._1).toSet
      }
      val candDocs = scores.keys
        .collect { case (t, d) if !nonEss(t) => d }.toSet
      val pruned = candDocs.toSeq.map(d => d -> byDoc(d))
        .sortBy { case (d, s) => (-s, d) }.take(k)
      assert(pruned === exhaustive,
        s"trial $trial k=$k: pruning changed the top-k (nonEss=$nonEss, θ=$theta)")
    }
  }
}
