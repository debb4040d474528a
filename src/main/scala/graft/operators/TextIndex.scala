package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable bucketed lexical index of the documents corpus — the third
  * [[LayoutCatalog]] artifact beside the bucketed edge corpus
  * ([[EdgeLayout]]) and the persisted IVF centroids: the tokenize +
  * explode + (doc, gram) aggregation every term-keyed text query
  * re-ran per execution is paid ONCE at ingest and every consumer
  * reads the aggregated postings exchange-free on the gram key.
  *
  * Two tables per artifact, one derivation:
  *
  *   - `postings` — (doc_id, g, tf) bigram term frequencies,
  *     CLUSTERED BY g INTO 32 BUCKETS: document frequency
  *     (`groupBy(g)`), idf weighting joins, and the posting-list
  *     SELF-join that generates sparse-cosine candidate pairs
  *     (q76's `wts a ⋈ wts b ON a.g = b.g`) all run on the bucket
  *     partitioning with ZERO exchange on the postings side.
  *   - `doclen` — (doc_id, dl) total bigram count per document: the
  *     doc-count-sized table the corpus-stats scalar aggregate (N
  *     docs, T total grams) reads. NEVER broadcast whole — since v3
  *     the per-posting `dl` consumers need is denormalized into the
  *     postings rows, so BM25's length normalization is a column
  *     read, not a join.
  *
  * The bigram definition is character-identical to the inline form
  * the oracles replay (split on single space, adjacent-token concat,
  * docs with < 2 tokens contribute nothing — the `sequence(1, 0)`
  * guard), so consuming the artifact cannot change any query's
  * result: it is a LAYOUT of the same rows, which is what the DuckDB
  * oracles continue to verify value-for-value.
  *
  * V2 — DETERMINISTIC BYTES. Every file the artifact writes is
  * TOTALLY ORDERED (bucket files by (g, doc_id) — unique per row
  * after the tf aggregate; doclen by doc_id in one file), so the
  * artifact's bytes are a pure function of its row set, independent
  * of build provenance.
  *
  * V3 — LSM SEGMENTS + DENORMALIZED dl. At 100 TB ingest is
  * append-only: a daily delta of new documents lands beside an
  * already-indexed archive, and re-paying the corpus per append —
  * either its tokenize (compute) or its bytes (the v2 merged-write)
  * — defeats the pay-once posture. [[incrementalPostings]] /
  * [[segmentedPostings]] therefore publish each delta as its OWN
  * bucketed segment artifact (tokenize the delta, write the delta —
  * O(delta) compute AND I/O) and serve reads as a union view over
  * archive + segments; doc_ids are disjoint across append
  * boundaries, so no (doc, gram) group straddles a segment and the
  * view is row-identical to a from-scratch rebuild. A compaction
  * rung folds the oldest maxSegments-multiple of segments (published
  * read-backs) into one artifact whose bytes are IDENTICAL to a
  * from-scratch build over the same documents (total file order ⇒
  * bytes are a function of the row set — LayoutCatalogSpec pins
  * per-bucket MD5 equality), amortizing the fold to one O(corpus)
  * write per maxSegments appends. Every split artifact embeds a
  * content key of its predicate, so a grown or changed split always
  * resolves fresh artifacts — never a stale archive that still
  * contains a later day's documents.
  * v3 also denormalizes `dl` into the postings rows, deleting the
  * doclen join (previously an unbounded broadcast) from every
  * BM25-family consumer.
  *
  * Trigram phrase postings (q159) deliberately stay inline: one
  * consumer does not earn a 1.5×-the-corpus-tokens artifact; add a
  * `phrases` table here if a second phrase consumer appears.
  */
object TextIndex {

  /** Bump when the BUILD semantics change (tokenization, gram order,
    * bucket count, file ordering), so an upgraded engine never
    * misreads an old artifact as current. v2: totally-ordered files
    * (sortBy(g, doc_id); doclen sorted by doc_id). v3: `dl` (the
    * document's total bigram count) DENORMALIZED into every postings
    * row — dl is constant per document, so carrying it beside tf
    * costs one BIGINT column at build time and deletes the
    * doc-count-sized `dl` join from every BM25-family consumer
    * (which previously BROADCAST doclen — a guaranteed OOM at 100 TB
    * where doclen is one row per document). */
  val LayoutVersion = 3

  /** (catalog root, sf dir, variant) → (postings location, doclen
    * location, name tag). Memoizes the resolve only — the artifact is
    * on disk and outlives the process. */
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    String, (java.io.File, java.io.File, String)]()

  /** Test hook: forget every in-process resolve (disk untouched), so
    * a spec can prove the durable read-back path. */
  def reset(): Unit = { resolved.clear(); resolvedPos.clear() }

  /** The shared derivation: adjacent-token bigrams of every document,
    * exactly as the inline consumers built them (q76/q90's
    * expression, including the size ≥ 2 guard against Spark's
    * descending `sequence(1, 0)` on single-token docs). */
  private def bigrams(docs: DataFrame): DataFrame =
    docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("g"))

  /** (doc_id, g, tf) aggregate of `docs` — the rows the artifact
    * stores. */
  private def tfOf(docs: DataFrame): DataFrame =
    bigrams(docs).groupBy("doc_id", "g").agg(count(lit(1)).as("tf"))

  /** Spread the tokenize kernel's input across the executor before
    * the per-doc map: a single-file corpus scans as ONE task (parquet
    * splits at row-group granularity), stranding the linear-dominant
    * tokenize on one core. The repartition moves only raw
    * (doc_id, text) bytes and its count scales with the input; the
    * artifact's bytes are unaffected (writeInto's final
    * repartition + total file order make output bytes a pure function
    * of the row set). */
  private def spread(s: SparkSession, dir: String, docs: DataFrame): DataFrame =
    docs.repartition(
      graft.Tables.scaledPartitions(s, dir, Seq("documents")), col("doc_id"))

  /** Attach the denormalized `dl` column (the document's total bigram
    * count = Σ tf over its grams) to a (doc_id, g, tf) frame: one
    * doc-keyed window pass — a single exchange at BUILD time that
    * deletes the doclen join from every query. A document lives
    * wholly on one side of any append boundary, so dl computed within
    * a delta segment equals dl computed over the full corpus. */
  private def withDl(postings: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    postings.withColumn("dl", sum(col("tf")).over(w))
  }

  /** Write `postings` (doc_id, g, tf, dl) into `tmp` as the
    * artifact's two tables. DETERMINISTIC BYTES: bucket files are
    * sorted by (g, doc_id) — a total order, since (doc_id, g) is
    * unique after the tf aggregate — and doclen is one file sorted by
    * doc_id, so the output bytes depend only on the row SET, not on
    * which path (from-scratch, segment, or compaction merge) produced
    * it. */
  private def writeInto(s: SparkSession, postings: DataFrame,
      tmp: java.io.File): Unit = {
    val bt = s"${LayoutCatalog.processTag}_${tmp.getName.hashCode.toHexString}"
    val postingsScratch = s"graft_build_postings_$bt"
    try {
      // one file per bucket: repartition on the bucket key with the
      // bucket count so the read-back claims HashPartitioning(g, 32).
      // coalesce(tf, 0) normalizes NULLABILITY: a fresh aggregate's
      // count() is non-nullable while a published table reads back
      // nullable — left as-is the two build paths would write
      // different parquet schemas/encodings (required vs optional
      // repetition) and break byte-identity (a .to(schema) widening
      // is optimized away; coalesce with a literal survives and pins
      // tf non-nullable on BOTH paths)
      postings.select(col("doc_id"), col("g"),
          coalesce(col("tf"), lit(0L)).as("tf"),
          coalesce(col("dl"), lit(0L)).as("dl"))
        .repartition(32, col("g"))
        .write.mode("overwrite")
        .bucketBy(32, "g").sortBy("g", "doc_id")
        .option("path", new java.io.File(tmp, "postings").getAbsolutePath)
        .saveAsTable(postingsScratch)
      // doc lengths from the postings read-back (a bucketed scan, not
      // a re-tokenize); doc-count-sized, one totally-ordered parquet
      // file — the corpus-stats (N, T) aggregate input
      s.table(postingsScratch)
        .groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        .repartition(1).sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(new java.io.File(tmp, "doclen").getAbsolutePath)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $postingsScratch")
    }
  }

  /** Idempotent per-session registration of the published bucketed
    * postings (same contract as [[EdgeLayout]]): CREATE TABLE over
    * the existing files re-attaches the bucket-spec metadata.
    * IF NOT EXISTS makes the check-then-create race-free. */
  private def registerIfAbsent(s: SparkSession, name: String,
      loc: java.io.File): Unit =
    if (!s.catalog.tableExists(name))
      s.sql(s"""CREATE TABLE IF NOT EXISTS $name (doc_id BIGINT, g STRING, tf BIGINT, dl BIGINT)
               |USING PARQUET
               |CLUSTERED BY (g) SORTED BY (g) INTO 32 BUCKETS
               |LOCATION '${loc.getAbsolutePath}'""".stripMargin)

  /** Resolve-or-build the artifact for (dir, variant): `variant` is
    * "" for the full-corpus index and a caller-chosen suffix for
    * subset/merged artifacts (it lands in the directory base name, so
    * retention never crosses variants). */
  private def ensure(s: SparkSession, dir: String, variant: String,
      build: java.io.File => Unit): (String, java.io.File) = {
    // the corpus fingerprint is part of the MEMO key, not just the
    // artifact name: a corpus path whose data changes within one JVM
    // (scratch-root probe harnesses) must re-resolve, not serve the
    // stale pre-change artifact (the pqN-cache lesson)
    val fp = LayoutCatalog.fingerprint(dir, Seq("documents"))
    val key = LayoutCatalog.root.getAbsolutePath + "|" + dir + "|" +
      variant + "|" + fp
    val (postingsLoc, doclenLoc, tag) = resolved.computeIfAbsent(key, _ => {
      val base = LayoutCatalog.sanitize(dir) +
        (if (variant.isEmpty) "" else s"_$variant")
      val dest = LayoutCatalog.publishedDir(s"lexical_v$LayoutVersion",
        base, fp)
      LayoutCatalog.buildAndPublish(dest, build)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val kh = md.digest((key + "|" + fp).getBytes("UTF-8"))
        .take(6).map(b => f"${b & 0xff}%02x").mkString
      (new java.io.File(dest, "postings"), new java.io.File(dest, "doclen"),
        s"${fp}_$kh")
    })
    val name = s"graft_postings_$tag"
    registerIfAbsent(s, name, postingsLoc)
    (name, doclenLoc)
  }

  private def ensureFull(s: SparkSession, dir: String): (String, java.io.File) =
    ensure(s, dir, "", tmp =>
      writeInto(s, withDl(tfOf(spread(s, dir,
        graft.Tables.load(s, dir, "documents")))), tmp))

  /** (doc_id, g, tf) bigram postings, bucketed by g — exchange-free
    * input for g-keyed aggregates, idf joins, and posting-list
    * self-joins. */
  def bigramPostings(s: SparkSession, dir: String): DataFrame =
    s.table(ensureFull(s, dir)._1)

  /** (doc_id, dl) total bigram count per document — doc-count-sized;
    * consumers broadcast it. */
  def docLengths(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureFull(s, dir)._2.getAbsolutePath)

  /** INCREMENTAL ingest, LSM-style: postings + doclens for the full
    * corpus at `dir`, built WITHOUT re-tokenizing the archive AND
    * without rewriting it. `deltaPred` marks "today's batch"; the
    * append publishes ONLY the delta's own segment artifact —
    * tokenize the delta, bucket-write its postings — so append
    * compute AND I/O are O(delta). The returned view unions the
    * archive's published postings with the segment's: row-identical
    * to a from-scratch rebuild (doc_ids are disjoint across the
    * append boundary, so no (doc, gram) group straddles it —
    * LayoutCatalogSpec pins the row identity, and pins BYTE identity
    * for the compacted artifact [[segmentedPostings]] folds segments
    * into). Returns (postings view, doclens view). */
  def incrementalPostings(s: SparkSession, dir: String,
      deltaPred: Column, tag: String): (DataFrame, DataFrame) =
    segmentedPostings(s, dir, Seq(deltaPred), tag)

  /** Multi-append LSM view with the archive defined as the complement
    * of the predicate set — the single-snapshot form ([[
    * incrementalPostings]] and the specs call it this way). Because
    * the archive's membership here DEPENDS on the predicate set, a
    * grown list re-derives the archive artifact (its row set shrank);
    * callers that append day-over-day and want the archive to stay
    * warm should use [[segmentedPostingsFrom]] with an explicit,
    * STABLE archive predicate instead. */
  def segmentedPostings(s: SparkSession, dir: String,
      deltaPreds: Seq[Column], tag: String, maxSegments: Int = 4)
      : (DataFrame, DataFrame) = {
    require(deltaPreds.nonEmpty, "need at least one delta predicate")
    segmentedPostingsFrom(s, dir, !deltaPreds.reduce(_ || _), deltaPreds,
      tag, maxSegments)
  }

  /** Multi-append LSM view: the archive (documents matching
    * `archPred`) plus one delta segment per predicate, each its own
    * durable artifact, unioned at read. `archPred` and the
    * `deltaPreds` MUST be pairwise disjoint and jointly cover the
    * corpus (each delta models one day's batch); every artifact name
    * embeds a CONTENT KEY of its predicate ([[LayoutCatalog.predKey]]),
    * so a changed or grown split can never silently reuse an artifact
    * built for a different partition of the corpus — appending day
    * N+1 reuses the archive and days 1..N's segments untouched and
    * pays O(delta) compute and I/O for the new segment only.
    *
    * COMPACTION is grouped and amortized: the oldest
    * ⌊N/maxSegments⌋·maxSegments segments fold (as published
    * read-backs — zero re-tokenization) with the archive into one
    * merged artifact whose bytes are identical to a from-scratch
    * build over the same documents (writeInto's total file order
    * makes bytes a pure function of the row set); the view is that
    * table plus the still-live tail segments. The fold artifact's
    * content key covers (archive, folded prefix), so between fold
    * boundaries every append reuses it — ONE O(corpus) write per
    * maxSegments appends, not per append. Old segment artifacts stay
    * on disk until the snapshot fingerprint rolls (concurrent readers
    * of the pre-compaction view never see files vanish); the next
    * corpus snapshot's retention sweep retires them. */
  def segmentedPostingsFrom(s: SparkSession, dir: String,
      archPred: Column, deltaPreds: Seq[Column], tag: String,
      maxSegments: Int = 4): (DataFrame, DataFrame) = {
    require(deltaPreds.nonEmpty, "need at least one delta predicate")
    val docs = graft.Tables.load(s, dir, "documents")
    val ak = LayoutCatalog.predKey(Seq(archPred))
    val (archName, archDl) = ensure(s, dir, s"${tag}_arch_$ak", tmp =>
      writeInto(s, withDl(tfOf(spread(s, dir, docs.filter(archPred)))), tmp))
    val segs = deltaPreds.zipWithIndex.map { case (p, i) =>
      ensureSegment(s, dir, p, tag, i)
    }
    val folded = deltaPreds.length - (deltaPreds.length % maxSegments)
    if (folded > 0) {
      val fk = LayoutCatalog.predKey(archPred +: deltaPreds.take(folded))
      val (mName, mDl) = ensure(s, dir, s"${tag}_compacted${folded}_$fk",
        tmp => writeInto(s,
          (archName +: segs.take(folded).map(_._1)).map(s.table)
            .reduce(_ unionByName _),
          tmp))
      val live = segs.drop(folded)
      val postings = (s.table(mName) +: live.map(x => s.table(x._1)))
        .reduce(_ unionByName _)
      val doclens = (mDl +: live.map(_._2))
        .map(f => s.read.parquet(f.getAbsolutePath))
        .reduce(_ unionByName _)
      (postings, doclens)
    } else {
      val postings = (archName +: segs.map(_._1)).map(s.table)
        .reduce(_ unionByName _)
      val doclens = (archDl +: segs.map(_._2))
        .map(f => s.read.parquet(f.getAbsolutePath))
        .reduce(_ unionByName _)
      (postings, doclens)
    }
  }

  private def ensureSegment(s: SparkSession, dir: String, pred: Column,
      tag: String, i: Int): (String, java.io.File) =
    ensure(s, dir, s"${tag}_seg${i}_${LayoutCatalog.predKey(Seq(pred))}",
      tmp => writeInto(s, withDl(tfOf(spread(s, dir,
        graft.Tables.load(s, dir, "documents").filter(pred)))), tmp))

  /** Publish ONE LSM segment artifact from an EXPLICIT row set — the
    * streaming ingest's entry point ([[graft.streaming.StreamOps
    * .lsmSegmentIngest]]): a micro-batch of arriving (doc_id, text)
    * rows IS its own delta, so it goes through the identical
    * tokenize → tf → dl → deterministic bucketed write as a
    * predicate-defined segment — same bytes for the same row set —
    * but keyed by a caller-supplied CONTENT KEY of the batch (the
    * streaming twin of [[LayoutCatalog.predKey]]; checkpointed
    * micro-batch replays re-derive the same key and land on the
    * published artifact — the publish is idempotent). Returns the
    * registered bucketed postings table name and the doclen file. */
  def publishSegmentRows(s: SparkSession, dir: String, docs: DataFrame,
      tag: String, i: Int, key: String): (String, java.io.File) =
    ensure(s, dir, s"${tag}_seg${i}_$key",
      tmp => writeInto(s, withDl(tfOf(docs)), tmp))

  /** The i-th delta segment of a segmented split, as its own bucketed
    * postings table — index-monitoring consumers (q290's delta
    * report) read the day's segment directly: its per-gram df IS the
    * document-frequency rise the append contributed (doc-disjoint
    * segments ⇒ df_merged − df_archive = df_segment). */
  def deltaSegment(s: SparkSession, dir: String, deltaPred: Column,
      tag: String, i: Int = 0): DataFrame =
    s.table(ensureSegment(s, dir, deltaPred, tag, i)._1)

  /** The ARCHIVE half of an incremental split (documents NOT matching
    * `deltaPred`), as its own durable artifact: (postings, doclens).
    * This is both the base [[segmentedPostings]] unions segments onto
    * and the seed a STREAMING index-maintenance consumer loads its
    * hot posting lists / global stats from
    * ([[graft.streaming.StreamOps.incrementalBm25]]). */
  def archiveIndex(s: SparkSession, dir: String,
      deltaPred: Column, tag: String): (DataFrame, DataFrame) = {
    val docs = graft.Tables.load(s, dir, "documents")
    // content-keyed identically to segmentedPostings' single-pred
    // archive (archPred = ¬deltaPred), so the two paths share the
    // artifact
    val ak = LayoutCatalog.predKey(Seq(!deltaPred))
    val (archName, archDl) = ensure(s, dir, s"${tag}_arch_$ak", tmp =>
      writeInto(s, withDl(tfOf(spread(s, dir, docs.filter(!deltaPred)))), tmp))
    (s.table(archName), s.read.parquet(archDl.getAbsolutePath))
  }

  // -----------------------------------------------------------------
  // POSITIONAL postings (round 14): (doc_id, tok, pos) — the
  // phrase/proximity probe-side schema (q303/q304) as its own
  // LSM'able artifact family, bucketed by tok so term-selected
  // posting probes and the n-way (doc_id, pos+offset) joins read
  // exchange-free on the term key. Same append-only contract as the
  // bigram family: each delta (or streamed micro-batch) publishes its
  // own O(delta) segment; positions are DOCUMENT-LOCAL, so a doc's
  // rows live wholly inside one segment and archive ∪ segments is
  // row-identical to a from-scratch build. Compaction deliberately
  // not implemented until a consumer needs it — the fold would follow
  // the bigram family's pattern verbatim.

  /** Bump when the positional BUILD semantics change. */
  val PositionalLayoutVersion = 1

  private val resolvedPos = new java.util.concurrent.ConcurrentHashMap[
    String, (java.io.File, String)]()

  /** The shared positional derivation — exactly q303/q304's inline
    * form: split on single space, 1-based positions, every doc (no
    * length guard: a 1-token doc contributes its single position). */
  private def positionalOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("col").as("tok"),
        (col("pos") + 1).cast("long").as("pos"))

  /** Deterministic bucketed write of (doc_id, tok, pos): one file per
    * bucket, rows totally ordered by (tok, doc_id, pos) — bytes a
    * pure function of the row set, like the bigram writeInto. */
  private def writeIntoPositional(s: SparkSession, pos: DataFrame,
      tmp: java.io.File): Unit = {
    val bt = s"${LayoutCatalog.processTag}_${tmp.getName.hashCode.toHexString}p"
    val scratch = s"graft_build_pospostings_$bt"
    try {
      pos.select(col("doc_id"), col("tok"),
          coalesce(col("pos"), lit(0L)).as("pos"))
        .repartition(32, col("tok"))
        .write.mode("overwrite")
        .bucketBy(32, "tok").sortBy("tok", "doc_id", "pos")
        .option("path", new java.io.File(tmp, "pospostings").getAbsolutePath)
        .saveAsTable(scratch)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $scratch")
    }
  }

  private def registerIfAbsentPositional(s: SparkSession, name: String,
      loc: java.io.File): Unit =
    if (!s.catalog.tableExists(name))
      s.sql(s"""CREATE TABLE IF NOT EXISTS $name (doc_id BIGINT, tok STRING, pos BIGINT)
               |USING PARQUET
               |CLUSTERED BY (tok) SORTED BY (tok) INTO 32 BUCKETS
               |LOCATION '${loc.getAbsolutePath}'""".stripMargin)

  /** Resolve-or-build one positional artifact for (dir, variant);
    * returns the registered bucketed table name. */
  private def ensurePositional(s: SparkSession, dir: String,
      variant: String, build: java.io.File => Unit): String = {
    val fp = LayoutCatalog.fingerprint(dir, Seq("documents"))
    val key = LayoutCatalog.root.getAbsolutePath + "|" + dir + "|" +
      variant + "|" + fp
    val (loc, tag) = resolvedPos.computeIfAbsent(key, _ => {
      val base = LayoutCatalog.sanitize(dir) + s"_$variant"
      val dest = LayoutCatalog.publishedDir(
        s"positional_v$PositionalLayoutVersion", base, fp)
      LayoutCatalog.buildAndPublish(dest, build)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val kh = md.digest((key + "|" + fp).getBytes("UTF-8"))
        .take(6).map(b => f"${b & 0xff}%02x").mkString
      (new java.io.File(dest, "pospostings"), s"${fp}_$kh")
    })
    val name = s"graft_pospostings_$tag"
    registerIfAbsentPositional(s, name, loc)
    name
  }

  /** Publish ONE positional LSM segment from an EXPLICIT row set —
    * the streaming ingest entry point ([[graft.streaming.StreamOps
    * .positionalSegmentIngest]]), keyed by a caller-supplied content
    * key of the micro-batch so checkpointed replays land on the
    * published artifact (idempotent). Returns the registered bucketed
    * table name. */
  def publishPositionalSegmentRows(s: SparkSession, dir: String,
      docs: DataFrame, tag: String, i: Int, key: String): String =
    ensurePositional(s, dir, s"${tag}_pseg${i}_$key",
      tmp => writeIntoPositional(s, positionalOf(docs), tmp))

  /** The ARCHIVE half of a positional split: documents matching
    * `archPred`, as a durable bucketed artifact. */
  def positionalArchive(s: SparkSession, dir: String,
      archPred: Column, tag: String): DataFrame = {
    val ak = LayoutCatalog.predKey(Seq(archPred))
    s.table(ensurePositional(s, dir, s"${tag}_parch_$ak", tmp =>
      writeIntoPositional(s, positionalOf(spread(s, dir,
        graft.Tables.load(s, dir, "documents").filter(archPred))), tmp)))
  }

  /** Multi-append positional LSM view: archive ∪ one segment per
    * delta predicate (pairwise disjoint, jointly covering the corpus
    * with the archive). Row-identical to deriving positions from the
    * full corpus — positions are document-local and doc_ids are
    * disjoint across the append boundary. */
  def segmentedPositionalFrom(s: SparkSession, dir: String,
      archPred: Column, deltaPreds: Seq[Column], tag: String): DataFrame = {
    val segs = deltaPreds.zipWithIndex.map { case (p, i) =>
      s.table(ensurePositional(s, dir,
        s"${tag}_pseg${i}_${LayoutCatalog.predKey(Seq(p))}",
        tmp => writeIntoPositional(s, positionalOf(spread(s, dir,
          graft.Tables.load(s, dir, "documents").filter(p))), tmp)))
    }
    (positionalArchive(s, dir, archPred, tag) +: segs)
      .reduce(_ unionByName _)
  }
}
