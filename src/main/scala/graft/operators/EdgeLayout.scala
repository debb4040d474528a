package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared bucketed layouts of the customer⇄supplier trading graph —
  * the pay-the-shuffle-once-at-ingest move q259 demonstrates,
  * promoted to the layout every graph query consumes (q94's
  * PageRank, q104's BFS, q123's triangle census, q157's label
  * propagation, q228's weighted shortest paths, q259's report).
  *
  * Since round 10 the layout is DURABLE: artifacts live under the
  * [[LayoutCatalog]] root keyed by a content fingerprint of the
  * corpus files they derive from, so a SECOND JVM (the production
  * contract: many jobs, one ingest) resolves them from disk instead
  * of re-paying the fact⋈fact derivation. A changed corpus snapshot
  * fingerprints to a new directory and rebuilds; the in-process map
  * only memoizes the resolve.
  *
  * Two artifacts, one derivation — both now WEIGHTED (round-9's
  * distinct layout forced q228 to re-run the fact join just for its
  * per-pair line counts; the count column costs 8 bytes/pair and
  * retires that whole join):
  *
  *   - `pairs`  — (c, s, n) with n = order-line count of the pair,
  *     CLUSTERED BY c: the one-mode-projection layout (per-customer
  *     degree caps and the c-keyed self-join run on the bucket
  *     partitioning); unweighted consumers project n away, which
  *     preserves the bucketing.
  *   - `edges`  — both directions (src, dst, n) with suppliers
  *     encoded −(s+1), CLUSTERED BY src: the vertex-program layout
  *     (degree/strength windows and every frontier⋈edges join consume
  *     it with no exchange on the edge side).
  *
  * Each table is repartitioned to exactly one file per bucket before
  * the write, so the scan reports HashPartitioning(key, 32) and the
  * bucket files stay sorted. Catalog table names derive from a hash
  * of the (root, corpus, fingerprint) key itself — never from a
  * mutable map size — so concurrent first-time resolves of different
  * corpora cannot alias, and re-registration is idempotent if the
  * SparkSession (and its catalog) is recreated mid-JVM.
  *
  * Semantics are a layout only: every consumer's oracle derives the
  * identical pair list straight from parquet.
  */
object EdgeLayout {

  /** Bump when the BUILD semantics change (v2 = weighted pairs), so
    * an upgraded engine never misreads a v1 artifact as current. */
  val LayoutVersion = 2

  /** (catalog root, sf dir) → (pairs location, edges location, name
    * tag). Memoizes the resolve only — the artifact itself is on
    * disk and outlives the process. */
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    String, (java.io.File, java.io.File, String)]()

  /** Test hook: forget every in-process resolve (disk untouched), so
    * a spec can prove the durable read-back path. */
  def reset(): Unit = resolved.clear()

  /** The one derivation both tables share: (c, s, n) trading pairs
    * with their order-line counts. Orders and lineitem are BOTH fact
    * tables (each grows with the corpus), so the pair join is a
    * sort-merge join on the order key — never a broadcast, which
    * would collect a corpus-sized projection to the driver at 100×. */
  private def derivePairs(s: SparkSession, dir: String): DataFrame = {
    // input-scaled shuffle width for the fact⋈fact sort-merge join:
    // one partition per ~64 MB of input holds the per-partition sort
    // at n·log(64 MB) instead of n·log(n/32) — the q192 fixed-width
    // cliff, fenced at the ingest join too. At the test SFs this
    // equals the session default, so the build plan there is
    // unchanged; the final bucketed write below stays at the
    // artifact's fixed 32 buckets either way.
    val np = graft.Tables.scaledPartitions(s, dir, Seq("orders", "lineitem"))
    val orders = graft.Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .repartition(np, col("o_orderkey"))
      .hint("merge")
    graft.Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .repartition(np, col("l_orderkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .agg(count(lit(1)).as("n"))
  }

  /** Build both bucketed tables under `tmp` (the catalog's
    * unpublished temp dir). Bucketed writes require saveAsTable, so
    * the build registers process-tagged scratch names and drops them
    * (external tables — the files stay) once written. */
  private def buildInto(s: SparkSession, dir: String,
      tmp: java.io.File): Unit = {
    val bt = s"${LayoutCatalog.processTag}_${tmp.getName.hashCode.toHexString}"
    val pairsScratch = s"graft_build_pairs_$bt"
    val edgesScratch = s"graft_build_edges_$bt"
    try {
      // one file per bucket: repartition on the bucket key with the
      // bucket count (same murmur3 hash as the bucketed write), so
      // the read-back claims HashPartitioning(key, 32) AND the
      // per-bucket sort survives as the scan's output ordering
      derivePairs(s, dir)
        .repartition(32, col("c"))
        .write.mode("overwrite")
        .bucketBy(32, "c").sortBy("c")
        .option("path", new java.io.File(tmp, "pairs").getAbsolutePath)
        .saveAsTable(pairsScratch)
      // both edge directions from ONE explode pass over the pairs
      // table read-back (cheap: a bucketed scan, not the fact join)
      s.table(pairsScratch)
        .select(explode(array(
          struct(col("c").as("src"), (-(col("s") + 1)).as("dst"),
            col("n")),
          struct((-(col("s") + 1)).as("src"), col("c").as("dst"),
            col("n")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.n").as("n"))
        .repartition(32, col("src"))
        .write.mode("overwrite")
        .bucketBy(32, "src").sortBy("src")
        .option("path", new java.io.File(tmp, "edges").getAbsolutePath)
        .saveAsTable(edgesScratch)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $pairsScratch")
      s.sql(s"DROP TABLE IF EXISTS $edgesScratch")
    }
  }

  /** Idempotent per-session registration of a published bucketed
    * table: CREATE TABLE over the existing files re-attaches the
    * bucket-spec metadata (Spark recovers each file's bucket id from
    * its name), so a recreated session reads the same artifact
    * exchange-free without rewriting a byte. IF NOT EXISTS makes the
    * check-then-create race-free: two threads resolving the same
    * layout concurrently in one session must both succeed. */
  private def registerIfAbsent(s: SparkSession, name: String,
      loc: java.io.File, schema: String, key: String): Unit =
    if (!s.catalog.tableExists(name))
      s.sql(s"""CREATE TABLE IF NOT EXISTS $name ($schema) USING PARQUET
               |CLUSTERED BY ($key) SORTED BY ($key) INTO 32 BUCKETS
               |LOCATION '${loc.getAbsolutePath}'""".stripMargin)

  private def ensure(s: SparkSession, dir: String): (String, String) = {
    val key = LayoutCatalog.root.getAbsolutePath + "|" + dir
    val (pairsLoc, edgesLoc, tag) = resolved.computeIfAbsent(key, _ => {
      val fp = LayoutCatalog.fingerprint(dir, Seq("orders", "lineitem"))
      val dest = LayoutCatalog.publishedDir(s"edges_v$LayoutVersion",
        LayoutCatalog.sanitize(dir), fp)
      LayoutCatalog.buildAndPublish(dest, tmp => buildInto(s, dir, tmp))
      // table-name tag from the KEY (never a map size): deterministic,
      // collision-free across corpora and catalog roots
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val kh = md.digest((key + "|" + fp).getBytes("UTF-8"))
        .take(6).map(b => f"${b & 0xff}%02x").mkString
      (new java.io.File(dest, "pairs"), new java.io.File(dest, "edges"),
        s"${fp}_$kh")
    })
    val pairsName = s"graft_pairs_$tag"
    val edgesName = s"graft_edges_$tag"
    registerIfAbsent(s, pairsName, pairsLoc,
      "c BIGINT, s BIGINT, n BIGINT", "c")
    registerIfAbsent(s, edgesName, edgesLoc,
      "src BIGINT, dst BIGINT, n BIGINT", "src")
    (pairsName, edgesName)
  }

  /** Distinct (c, s) trading pairs, bucketed by c — exchange-free
    * input for c-keyed aggregates and self-joins. (A projection of
    * the weighted table; pruning n keeps the bucketing.) */
  def pairs(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir)._1).select("c", "s")

  /** (c, s, n) trading pairs with order-line counts, bucketed by c. */
  def weightedPairs(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir)._1)

  /** Symmetric (src, dst) edge list (suppliers −(s+1)), bucketed by
    * src — exchange-free edge side for every vertex-program join. */
  def edges(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir)._2).select("src", "dst")

  /** Symmetric (src, dst, n) edge list with per-edge line counts,
    * bucketed by src — the weighted vertex-program layout (q228's
    * friction weights, q284's volume-weighted rank). */
  def weightedEdges(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir)._2)
}
