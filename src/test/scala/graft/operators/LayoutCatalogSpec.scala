package graft.operators

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The durable-layout contract (round-10 promotion of the per-JVM tmp
  * artifacts): a layout built once is resolved FROM DISK by a later
  * process — proven here by clearing the in-process memo (the only
  * JVM-local state) and re-resolving — and a changed corpus snapshot
  * fingerprints to a new artifact, rebuilds, and retires the stale
  * sibling. The in-memory clear + catalog drop is exactly what a new
  * JVM sees: empty memo, empty session catalog, files on disk.
  */
class LayoutCatalogSpec extends SparkSpec {

  private val scratch =
    Files.createTempDirectory("graft-layout-spec").toFile

  override def beforeAll(): Unit = {
    super.beforeAll()
    sys.props("graft.layout.root") = new File(scratch, "root").getAbsolutePath
    EdgeLayout.reset()
    Ivf.reset()
    TextIndex.reset()
    IvfPq.reset()
    PairGraph.reset()
  }

  override def afterAll(): Unit = {
    // restore the default root for later suites in the shared JVM and
    // drop any memoized resolves that point into the scratch root
    sys.props.remove("graft.layout.root")
    EdgeLayout.reset()
    Ivf.reset()
    TextIndex.reset()
    IvfPq.reset()
    PairGraph.reset()
    LayoutCatalog.deleteRecursively(scratch)
    super.afterAll()
  }

  /** A private corpus copy (orders + lineitem are all the edge layout
    * fingerprints and reads) so mtime edits never touch the shared
    * read-only fixtures. */
  private lazy val corpus: File = {
    val d = new File(scratch, "corpus"); d.mkdirs()
    Seq("orders", "lineitem", "embeddings", "documents").foreach { t =>
      Files.copy(new File(s"/root/testdata/sf0.001/$t.parquet").toPath,
        new File(d, s"$t.parquet").toPath,
        StandardCopyOption.REPLACE_EXISTING)
    }
    d
  }

  private def edgeTableNames(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name)
      .filter(n => n.startsWith("graft_pairs_") || n.startsWith("graft_edges_"))
      .toSeq

  test("edge layout: built once, re-resolved from disk by a 'new process'") {
    val dir = corpus.getAbsolutePath
    val before = LayoutCatalog.buildsPublished.get()
    val cold = EdgeLayout.weightedPairs(spark, dir)
      .orderBy("c", "s").collect().map(_.toSeq).toSeq
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "cold resolve must publish exactly one artifact")
    assert(cold.nonEmpty)

    // simulate a brand-new JVM: no memo, no catalog entries — only disk
    EdgeLayout.reset()
    edgeTableNames().foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    val warm = EdgeLayout.weightedPairs(spark, dir)
      .orderBy("c", "s").collect().map(_.toSeq).toSeq
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "warm resolve must NOT rebuild — the artifact is durable")
    assert(warm == cold, "disk read-back must be bit-identical")
  }

  test("edge layout: warm read-back keeps the bucketed (exchange-free) scan") {
    val dir = corpus.getAbsolutePath
    EdgeLayout.reset()
    edgeTableNames().foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    // AQE wraps the plan in an opaque AdaptiveSparkPlanExec; disable it
    // so the scan/exchange assertions can see the nodes
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p =
      try EdgeLayout.edges(spark, dir)
        .groupBy("src").agg(count(lit(1)).as("d"))
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val scans = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.relation.bucketSpec.isDefined),
      s"re-registered table must still read as bucketed:\n$p")
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"src aggregate over the bucketed scan must not shuffle:\n$p")
  }

  test("lexical index: built once, re-resolved from disk, postings exact") {
    val dir = corpus.getAbsolutePath
    val before = LayoutCatalog.buildsPublished.get()
    val cold = TextIndex.bigramPostings(spark, dir)
      .orderBy("doc_id", "g").collect().map(_.toSeq).toSeq
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "cold resolve must publish exactly one lexical artifact")
    assert(cold.nonEmpty)

    // postings must equal the inline derivation character for character
    val inline = graft.Tables.load(spark, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "g").collect().map(_.toSeq).toSeq
    // v3 postings carry the denormalized dl as a 4th column
    assert(cold.map(_.take(3)) == inline,
      "artifact postings must equal the inline tf table")

    // doc lengths: Σ tf per doc, persisted — equal by construction
    val dl = TextIndex.docLengths(spark, dir)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val dlInline = inline.groupBy(_.head).view
      .mapValues(_.map(_(2).asInstanceOf[Long]).sum).toSeq
      .sortBy(_._1.asInstanceOf[Long]).map(kv => Seq(kv._1, kv._2))
    assert(dl == dlInline)

    // simulate a brand-new JVM: no memo, no catalog entries — only disk
    TextIndex.reset()
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_postings_"))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    val warm = TextIndex.bigramPostings(spark, dir)
      .orderBy("doc_id", "g").collect().map(_.toSeq).toSeq
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "warm resolve must NOT rebuild — the artifact is durable")
    assert(warm == cold, "disk read-back must be bit-identical")
  }

  test("lexical index: g-keyed aggregate and self-join run exchange-free") {
    val dir = corpus.getAbsolutePath
    TextIndex.reset()
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_postings_"))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p =
      try {
        val tf = TextIndex.bigramPostings(spark, dir)
        val df = tf.groupBy("g").agg(count(lit(1)).as("df"))
        tf.join(df.hint("shuffle_hash"), "g")
          .queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val scans = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.relation.bucketSpec.isDefined),
      s"postings must read as bucketed:\n$p")
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"df aggregate + idf join over the bucketed postings " +
      s"must not shuffle:\n$p")
  }

  private def bucketBytes(d: File): Map[String, String] = {
    val re = "_(\\d{5})\\.c000".r
    Option(new File(d, "postings").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val bucket = re.findFirstMatchIn(f.getName).get.group(1)
        val md = java.security.MessageDigest.getInstance("MD5")
        bucket -> md.digest(Files.readAllBytes(f.toPath))
          .map(b => f"$b%02x").mkString
      }.toMap
  }

  private def doclenBytes(d: File): String = {
    val f = Option(new File(d, "doclen").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    assert(f.length == 1)
    java.security.MessageDigest.getInstance("MD5")
      .digest(Files.readAllBytes(f.head.toPath)).map(b => f"$b%02x").mkString
  }

  test("lexical index: LSM append publishes only the delta segment; the view equals a rebuild row-for-row") {
    val dir = corpus.getAbsolutePath
    TextIndex.reset()
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_postings_"))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    // from-scratch artifact over the full corpus
    val full = TextIndex.bigramPostings(spark, dir)
      .orderBy("doc_id", "g").collect().map(_.toSeq).toSeq
    // LSM append: doc_id % 10 == 0 is "today's batch"; the archive
    // indexes separately, the append writes ONLY the delta's own
    // segment artifact, and the view unions the two
    val (inc, incDl) = TextIndex.incrementalPostings(spark, dir,
      col("doc_id") % 10 === 0, "d10")
    assert(inc.orderBy("doc_id", "g").collect().map(_.toSeq).toSeq == full,
      "the union view's rows must equal the from-scratch table")
    assert(incDl.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      TextIndex.docLengths(spark, dir).orderBy("doc_id")
        .collect().map(_.toSeq).toSeq)
    // append I/O contract: the delta's segment artifact exists and
    // holds ONLY delta documents; NO merged/compacted artifact was
    // written (the O(corpus)-bytes rewrite is gone)
    val kind = new File(LayoutCatalog.root, s"lexical_v${TextIndex.LayoutVersion}")
    val pub = kind.listFiles().filterNot(_.getName.startsWith(".tmp_"))
    assert(pub.exists(_.getName.contains("_d10_seg0_")),
      s"delta segment must publish: ${pub.map(_.getName).toSeq}")
    assert(!pub.exists(d => d.getName.contains("_d10_merged") ||
        d.getName.contains("_d10_compacted")),
      s"a single append must not write an O(corpus) artifact: ${pub.map(_.getName).toSeq}")
    val segDir = pub.find(_.getName.contains("_d10_seg0_")).get
    val segRows = spark.read.parquet(
      new File(segDir, "postings").getAbsolutePath)
    assert(segRows.filter(col("doc_id") % 10 =!= 0).count() === 0,
      "segment holds only delta docs")
    assert(segRows.count() ===
      inc.filter(col("doc_id") % 10 === 0).count())
    // dl denormalization: every postings row's dl equals its doc's
    // total tf — checked against the doclen table
    val mismatch = TextIndex.bigramPostings(spark, dir).alias("p")
      .join(TextIndex.docLengths(spark, dir)
        .withColumnRenamed("dl", "dl2"), "doc_id")
      .filter(col("dl") =!= col("dl2")).count()
    assert(mismatch === 0, "denormalized dl must equal the doclen table")
  }

  test("lexical index: compaction folds archive+segments into an artifact byte-identical to a rebuild") {
    val dir = corpus.getAbsolutePath
    TextIndex.reset()
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_postings_"))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    TextIndex.bigramPostings(spark, dir).queryExecution.toRdd.count()
    // four disjoint daily deltas (doc_id % 10 ∈ 0..3; archive = 4..9)
    // reach the maxSegments=4 fold boundary → the oldest
    // maxSegments-multiple (all four) compacts with the archive,
    // covering the FULL corpus
    val preds = (0 to 3).map(i => col("doc_id") % 10 === i)
    val (view, viewDl) = TextIndex.segmentedPostings(
      spark, dir, preds, "lsm", maxSegments = 4)
    assert(view.orderBy("doc_id", "g").collect().map(_.toSeq).toSeq ==
      TextIndex.bigramPostings(spark, dir)
        .orderBy("doc_id", "g").collect().map(_.toSeq).toSeq,
      "compacted view rows must equal the from-scratch table")
    assert(viewDl.count() === TextIndex.docLengths(spark, dir).count())
    val kind = new File(LayoutCatalog.root, s"lexical_v${TextIndex.LayoutVersion}")
    val pub = kind.listFiles().filterNot(_.getName.startsWith(".tmp_"))
    val fullDir = pub.find(d => !d.getName.contains("_lsm_") &&
      !d.getName.contains("_d10_") && !d.getName.contains("_ml_")).get
    val compDir = pub.find(_.getName.contains("_lsm_compacted4_")).get
    // byte-for-byte: files are totally ordered, so the compacted
    // artifact's parquet bytes must equal the from-scratch build's,
    // bucket for bucket — the strongest possible no-drift statement
    val fb = bucketBytes(fullDir)
    val cb = bucketBytes(compDir)
    assert(fb.nonEmpty && fb == cb,
      s"per-bucket parquet bytes must match: full=${fb.keySet} compacted=${cb.keySet}")
    assert(doclenBytes(fullDir) == doclenBytes(compDir),
      "doclen parquet bytes must match")
  }

  test("lexical index: a grown predicate list never double-counts, and appends past the fold boundary reuse the compacted artifact") {
    val dir = corpus.getAbsolutePath
    TextIndex.reset()
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_postings_"))
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    val full = TextIndex.bigramPostings(spark, dir)
    // STABLE archive boundary (docs with doc_id % 10 ∈ 6..9); days
    // 0..5 arrive one predicate at a time
    val archPred = col("doc_id") % 10 >= 6
    def day(i: Int) = col("doc_id") % 10 === i
    // day 5 state: archive + days 0..4 → folded = 4, seg4 live
    val (v5, _) = TextIndex.segmentedPostingsFrom(
      spark, dir, archPred, (0 to 4).map(day), "ml", maxSegments = 4)
    val expect5 = full.filter(col("doc_id") % 10 =!= 5)
    assert(v5.count() === expect5.count())
    assert(v5.count() ===
      v5.select("doc_id", "g").distinct().count(),
      "no (doc, gram) group may appear twice in the view")
    val before = LayoutCatalog.buildsPublished.get()
    // day 6 append: ONLY the new segment may build — the archive,
    // days 0..4's segments, and the day-4 fold are all reused (this
    // is the O(delta) append contract; pre-fix the archive keyed only
    // by tag and silently reused a row set that still CONTAINED day
    // 5's documents, double-counting them in the view)
    val (v6, _) = TextIndex.segmentedPostingsFrom(
      spark, dir, archPred, (0 to 5).map(day), "ml", maxSegments = 4)
    assert(LayoutCatalog.buildsPublished.get() === before + 1,
      "appending one day must publish exactly one new artifact")
    assert(v6.orderBy("doc_id", "g").collect().map(_.toSeq).toSeq ==
      full.orderBy("doc_id", "g").collect().map(_.toSeq).toSeq,
      "the grown view must equal the from-scratch table exactly")
  }

  test("ivf-pq index: built once, re-resolved from disk, bit-identical") {
    val dir = corpus.getAbsolutePath
    import org.apache.spark.sql.functions.{col, expr}
    val base = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .withColumn("qn", graft.functions.VecMath.qdot(col("qv"), col("qv")))
      .filter(col("qn") > 0)
      .select("vec_id", "qv", "qn")
    val cents = Ivf.persistedCentroidsCosine(base, dir, "vec_id", "qv", 8, 2)
    val before = LayoutCatalog.buildsPublished.get()
    val (codes, cb) = IvfPq.persistedIndex(base, dir, cents, 8, 2, 3)
    val coldCodes = codes.orderBy("vec_id", "centroid_id", "subspace")
      .collect().map(_.toSeq).toSeq
    val coldCb = cb.orderBy("subspace", "code").collect().map(_.toSeq).toSeq
    assert(LayoutCatalog.buildsPublished.get() == before + 1)
    assert(coldCodes.nonEmpty && coldCb.length === 128)

    IvfPq.reset()
    val (codes2, cb2) = IvfPq.persistedIndex(base, dir, cents, 8, 2, 3)
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "warm resolve must NOT rebuild — the index is durable")
    assert(codes2.orderBy("vec_id", "centroid_id", "subspace")
      .collect().map(_.toSeq).toSeq == coldCodes)
    assert(cb2.orderBy("subspace", "code")
      .collect().map(_.toSeq).toSeq == coldCb)
    // every indexed copy codes all 8 subspaces; codes are valid ids
    val perCopy = codes2.groupBy("vec_id", "centroid_id")
      .count().select("count").distinct().collect().map(_.getLong(0)).toSeq
    assert(perCopy === Seq(8L))
    assert(codes2.filter(col("code") < 0 || col("code") > 15).count() === 0)
  }

  private def partBytes(d: File): Map[String, String] = {
    val re = "part-(\\d{5})-".r
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val p = re.findFirstMatchIn(f.getName).get.group(1)
        val md = java.security.MessageDigest.getInstance("MD5")
        p -> md.digest(Files.readAllBytes(f.toPath))
          .map(b => f"$b%02x").mkString
      }.toMap
  }

  private def pqBase(dir: String) =
    graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .withColumn("qn", graft.functions.VecMath.qdot(col("qv"), col("qv")))
      .filter(col("qn") > 0)
      .select("vec_id", "qv", "qn")

  test("ivf-pq incremental: delta codes publish as their own segment; view equals frozen-codebook rebuild") {
    val dir = corpus.getAbsolutePath
    IvfPq.reset()
    Ivf.reset()
    val base = pqBase(dir)
    val deltaPred = col("vec_id") % 10 === 0
    val (codes, cbt, cents) = IvfPq.incrementalIndex(
      base, dir, deltaPred, "d10", 8, 2, 3)
    // the view must cover BOTH sides of the append boundary
    assert(codes.filter(col("vec_id") % 10 === 0).count() > 0)
    assert(codes.filter(col("vec_id") % 10 =!= 0).count() > 0)
    // codebook seeds are the ARCHIVE's sub-16 ids (frozen training
    // never sees the delta, so delta ids 0 and 10 are not codewords)
    val nSeeds = base.filter(col("vec_id") < 16 && col("vec_id") % 10 =!= 0)
      .count()
    assert(cbt.count() === nSeeds * 8)
    // append I/O contract: the delta's codes live in their own
    // segment artifact; no merged rewrite of the archive happened
    val kind = new File(LayoutCatalog.root, s"ivfpq_v${IvfPq.LayoutVersion}")
    val pub = kind.listFiles().filterNot(_.getName.startsWith(".tmp_"))
    val segDir = pub.find(_.getName.contains("_d10_seg0_"))
    assert(segDir.isDefined,
      s"delta code segment must publish: ${pub.map(_.getName).toSeq}")
    assert(!pub.exists(d => d.getName.contains("_d10_merged") ||
        d.getName.contains("_d10_compacted")),
      s"a single append must not write an O(corpus) artifact: ${pub.map(_.getName).toSeq}")
    val segCodes = spark.read.parquet(
      new File(segDir.get, "codes").getAbsolutePath)
    assert(segCodes.filter(col("vec_id") % 10 =!= 0).count() === 0,
      "segment holds only delta codes")
    // frozen-codebook rebuild: train on the archive, code EVERYTHING —
    // the from-scratch equivalent of the segmented view
    val rebuild = Files.createTempDirectory("graft-pq-rebuild").toFile
    try {
      IvfPq.buildInto(base.filter(!deltaPred), base, cents, 3, rebuild)
      val rebuilt = spark.read.parquet(
        new File(rebuild, "codes").getAbsolutePath)
        .orderBy("vec_id", "centroid_id", "subspace")
        .collect().map(_.toSeq).toSeq
      assert(codes.orderBy("vec_id", "centroid_id", "subspace")
        .collect().map(_.toSeq).toSeq == rebuilt,
        "view rows must equal the frozen-codebook rebuild")
    } finally LayoutCatalog.deleteRecursively(rebuild)
  }

  test("ivf-pq compaction: folded segments byte-identical to the frozen-codebook rebuild") {
    val dir = corpus.getAbsolutePath
    IvfPq.reset()
    Ivf.reset()
    val base = pqBase(dir)
    // four disjoint daily deltas reach the maxSegments=4 fold
    // boundary → the fold covers the full corpus
    val preds = (0 to 3).map(i => col("vec_id") % 10 === i)
    val anyDelta = preds.reduce(_ || _)
    val (codes, _, cents) = IvfPq.segmentedIndex(
      base, dir, preds, "lsm", 8, 2, 3, maxSegments = 4)
    val kind = new File(LayoutCatalog.root, s"ivfpq_v${IvfPq.LayoutVersion}")
    val compDir = kind.listFiles()
      .filter(d => d.getName.contains("_lsm_compacted4_") &&
        !d.getName.startsWith(".tmp_")).head
    val rebuild = Files.createTempDirectory("graft-pq-rebuild2").toFile
    try {
      IvfPq.buildInto(base.filter(!anyDelta), base, cents, 3, rebuild)
      val mc = partBytes(new File(compDir, "codes"))
      val rc = partBytes(new File(rebuild, "codes"))
      assert(mc.nonEmpty && mc == rc,
        s"codes parquet bytes must match per partition: compacted=${mc.keySet} rebuild=${rc.keySet}")
      assert(partBytes(new File(compDir, "codebook")) ==
        partBytes(new File(rebuild, "codebook")),
        "codebook parquet bytes must match")
      assert(codes.count() > 0)
    } finally LayoutCatalog.deleteRecursively(rebuild)
  }

  test("ivf-pq multi-append: a grown predicate list never double-codes and reuses the fold") {
    val dir = corpus.getAbsolutePath
    IvfPq.reset()
    Ivf.reset()
    val base = pqBase(dir)
    val archPred = col("vec_id") % 10 >= 6
    def day(i: Int) = col("vec_id") % 10 === i
    val (v5, _, _) = IvfPq.segmentedIndexFrom(
      base, dir, archPred, (0 to 4).map(day), "ml", 8, 2, 3, maxSegments = 4)
    assert(v5.count() ===
      v5.select("vec_id", "centroid_id", "subspace").distinct().count(),
      "no (copy, subspace) may be coded twice in the view")
    val before = LayoutCatalog.buildsPublished.get()
    val (v6, _, _) = IvfPq.segmentedIndexFrom(
      base, dir, archPred, (0 to 5).map(day), "ml", 8, 2, 3, maxSegments = 4)
    assert(LayoutCatalog.buildsPublished.get() === before + 1,
      "appending one day must publish exactly one new code segment")
    assert(v6.count() ===
      v6.select("vec_id", "centroid_id", "subspace").distinct().count())
    // day 5 was absent before the append, present exactly once after,
    // and the append added nothing else
    assert(v5.filter(col("vec_id") % 10 === 5).count() === 0)
    val day5 = v6.filter(col("vec_id") % 10 === 5).count()
    assert(day5 > 0)
    assert(v6.count() === v5.count() + day5)
  }

  test("edge layout: weighted pairs carry the exact per-pair line counts") {
    val dir = corpus.getAbsolutePath
    val wp = EdgeLayout.weightedPairs(spark, dir)
    // ground truth straight from the facts
    val truth = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("n"))
    assert(wp.join(truth, Seq("c", "s"))
      .filter(wp("n") =!= truth("n")).count() == 0)
    assert(wp.count() == truth.count())
    // the unweighted view is the same rows, projected
    assert(EdgeLayout.pairs(spark, dir).distinct().count() == wp.count())
  }

  test("edge layout: a changed corpus snapshot rebuilds and retires the stale artifact") {
    val dir = corpus.getAbsolutePath
    EdgeLayout.weightedPairs(spark, dir).queryExecution // ensure built
    val kind = new File(LayoutCatalog.root, s"edges_v${EdgeLayout.LayoutVersion}")
    val oldDirs = kind.listFiles().map(_.getName).toSet
    assert(oldDirs.count(!_.startsWith(".tmp_")) == 1)

    // a new snapshot: same bytes, new mtime — the fingerprint moves
    val li = new File(corpus, "lineitem.parquet")
    assert(li.setLastModified(li.lastModified() + 60000))
    EdgeLayout.reset()
    val before = LayoutCatalog.buildsPublished.get()
    EdgeLayout.weightedPairs(spark, dir).count()
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "changed fingerprint must rebuild")
    val newDirs = kind.listFiles().map(_.getName)
      .filterNot(_.startsWith(".tmp_")).toSet
    assert(newDirs.size == 1 && newDirs.intersect(oldDirs).isEmpty,
      s"retention must keep only the live artifact: old=$oldDirs new=$newDirs")
  }

  test("ivf centroids: trained once, re-resolved from disk, bit-identical") {
    val dir = corpus.getAbsolutePath
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(round(x * 64) AS BIGINT))")
          .as("qv"))
    val before = LayoutCatalog.buildsPublished.get()
    val cold = Ivf.persistedCentroidsCosine(base, dir, "vec_id", "qv", 4, 1)
      .orderBy("centroid_id").collect().map(_.toSeq).toSeq
    assert(LayoutCatalog.buildsPublished.get() == before + 1)

    Ivf.reset()
    val warm = Ivf.persistedCentroidsCosine(base, dir, "vec_id", "qv", 4, 1)
      .orderBy("centroid_id").collect().map(_.toSeq).toSeq
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "warm resolve must read the persisted table, not retrain")
    assert(warm == cold)
  }

  test("multi-generation retention: a rolled corpus snapshot retires every old-generation split artifact") {
    // compaction deliberately leaves superseded segments on disk
    // within a snapshot (concurrent readers of the pre-fold view must
    // never see files vanish); the disk-boundedness claim is that the
    // NEXT corpus fingerprint's re-publish sweep retires the whole
    // old generation — archive, every segment, and the fold artifact
    val dir = corpus.getAbsolutePath
    def resetSession(): Unit = {
      TextIndex.reset()
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith("graft_postings_"))
        .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    }
    resetSession()
    val archPred = col("doc_id") % 10 >= 5
    def day(i: Int) = col("doc_id") % 10 === i
    // five appends → past the maxSegments=4 fold: the generation is
    // archive + seg0..4 + compacted4 = 7 artifacts
    TextIndex.segmentedPostingsFrom(spark, dir, archPred,
      (0 to 4).map(day), "mg")._1.queryExecution.toRdd.count()
    val kind = new File(LayoutCatalog.root,
      s"lexical_v${TextIndex.LayoutVersion}")
    def gen(): Set[String] = kind.listFiles().map(_.getName)
      .filterNot(_.startsWith(".tmp_")).filter(_.contains("_mg_")).toSet
    val gen1 = gen()
    assert(gen1.size == 7, s"archive + 5 segments + fold: $gen1")

    // roll the snapshot: same bytes, new mtime — fingerprint moves
    val doc = new File(corpus, "documents.parquet")
    assert(doc.setLastModified(doc.lastModified() + 60000))
    resetSession()
    TextIndex.segmentedPostingsFrom(spark, dir, archPred,
      (0 to 4).map(day), "mg")._1.queryExecution.toRdd.count()
    val gen2 = gen()
    assert(gen2.size == 7, s"new generation fully re-derived: $gen2")
    assert(gen2.intersect(gen1).isEmpty,
      s"every old-generation artifact must be retired: " +
        s"survivors=${gen2.intersect(gen1)}")
  }

  test("retention never deletes a prefix-ambiguous sibling corpus") {
    // sanitized base names are prefix-ambiguous: corpus "corpA"
    // publishing a new fingerprint must retire only ITS stale
    // sibling (base + '_' + 16-hex fingerprint, exactly), never the
    // live artifact of corpus "corpA_b" whose name shares the prefix
    def pub(d: File, payload: String): Unit =
      LayoutCatalog.buildAndPublish(d, tmp => {
        tmp.mkdirs()
        Files.writeString(new File(tmp, "p").toPath, payload): Unit
      })
    val a1 = LayoutCatalog.publishedDir("retkind", "corpA", "aaaaaaaaaaaaaaaa")
    val b1 = LayoutCatalog.publishedDir("retkind", "corpA_b", "bbbbbbbbbbbbbbbb")
    pub(a1, "a1"); pub(b1, "b1")
    val a2 = LayoutCatalog.publishedDir("retkind", "corpA", "cccccccccccccccc")
    pub(a2, "a2")
    assert(!a1.exists(), "same corpus, stale fingerprint: retired")
    assert(LayoutCatalog.isPublished(a2))
    assert(LayoutCatalog.isPublished(b1),
      "prefix-sharing sibling corpus must survive retention")
    assert(Files.readString(new File(b1, "p").toPath) == "b1")
  }

  test("publish is atomic: a visible artifact directory always carries _meta") {
    // _meta is stamped INSIDE the temp dir before the rename, so a
    // published dest is born committed — there is no rename-to-stamp
    // window in which a concurrent builder could mistake the winner's
    // fresh data for a torn build and delete it
    val d = LayoutCatalog.publishedDir("atomkind", "base", "dddddddddddddddd")
    LayoutCatalog.buildAndPublish(d, tmp => {
      tmp.mkdirs()
      Files.writeString(new File(tmp, "p").toPath, "x")
      // the commit marker must not exist in the temp until publish
      // stamps it (the builder callback never writes it)
      assert(!new File(tmp, "_meta").isFile)
      ()
    })
    assert(LayoutCatalog.isPublished(d))
  }

  test("pair graph: built once, re-resolved from disk, retired on a rolled snapshot") {
    // the round-14 artifact (operators/PairGraph): q299/q307's shared
    // qualifying-pair list must follow the full catalog contract —
    // one build per snapshot, warm resolves from disk, retention on
    // a rolled fingerprint. Runs LAST among the corpus-layout tests
    // because it rolls documents.parquet's mtime.
    val dir = corpus.getAbsolutePath
    PairGraph.reset()
    val before = LayoutCatalog.buildsPublished.get()
    val cold = PairGraph.qualifyingPairs(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(LayoutCatalog.buildsPublished.get() == before + 1)
    assert(cold.nonEmpty, "fixture must contain qualifying pairs")

    PairGraph.reset()
    val warm = PairGraph.qualifyingPairs(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(LayoutCatalog.buildsPublished.get() == before + 1,
      "warm resolve must read the published artifact, not re-derive")
    assert(warm == cold)

    // roll the snapshot: same bytes, new mtime — the fingerprint moves
    val kind = new File(LayoutCatalog.root,
      s"pairs07_v${PairGraph.LayoutVersion}")
    val oldDirs = kind.listFiles().map(_.getName)
      .filterNot(_.startsWith(".tmp_")).toSet
    val docs = new File(corpus, "documents.parquet")
    assert(docs.setLastModified(docs.lastModified() + 60000))
    PairGraph.reset()
    PairGraph.qualifyingPairs(spark, dir).queryExecution.toRdd.count()
    assert(LayoutCatalog.buildsPublished.get() == before + 2,
      "changed fingerprint must rebuild")
    val newDirs = kind.listFiles().map(_.getName)
      .filterNot(_.startsWith(".tmp_")).toSet
    assert(newDirs.size == 1 && newDirs.intersect(oldDirs).isEmpty,
      s"retention must keep only the live artifact: old=$oldDirs new=$newDirs")
  }

  test("publish loser of a concurrent race reads the winner's artifact") {
    // two 'processes' racing on one fingerprint: simulate the loser by
    // pre-publishing dest, then calling buildAndPublish — the build
    // callback must be skipped entirely (published-artifact fast path)
    val dest = LayoutCatalog.publishedDir("racekind", "base", "aabbccdd")
    LayoutCatalog.buildAndPublish(dest, tmp => {
      tmp.mkdirs()
      Files.writeString(new File(tmp, "payload").toPath, "winner")
    })
    var called = false
    LayoutCatalog.buildAndPublish(dest, _ => { called = true })
    assert(!called, "a published artifact must short-circuit the build")
    assert(Files.readString(new File(dest, "payload").toPath) == "winner")
  }
}
