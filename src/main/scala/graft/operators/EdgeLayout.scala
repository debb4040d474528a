package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared bucketed layouts of the customer⇄supplier trading graph —
  * the pay-the-shuffle-once-at-ingest move q259 demonstrates,
  * promoted to the layout every graph query consumes (q94's
  * PageRank, q104's BFS, q123's triangle census, q157's label
  * propagation, q259's report): the distinct pair list is derived
  * ONCE per (JVM, sf dir), written as 32-bucket tables, and read
  * back exchange-free by every consumer. At production scale this is
  * the difference between re-shuffling the edge corpus per graph
  * query and paying its shuffle once at ingest.
  *
  * Two artifacts, one derivation:
  *
  *   - `pairs`  — distinct (c, s), CLUSTERED BY c: the one-mode-
  *     projection layout (per-customer degree caps and the c-keyed
  *     self-join both run on the bucket partitioning);
  *   - `edges`  — both directions (src, dst) with suppliers encoded
  *     −(s+1), CLUSTERED BY src: the vertex-program layout (degree
  *     windows and every frontier⋈edges join consume it with no
  *     exchange on the edge side).
  *
  * Each table is repartitioned to exactly one file per bucket before
  * the write, so the scan reports HashPartitioning(key, 32) and the
  * bucket files stay sorted. Locations and table names carry a
  * per-JVM run tag (pid + JVM start nanos), so concurrent sessions
  * on one host never collide on the path or the session catalog —
  * the round-8 q259 hygiene gap.
  *
  * Semantics are a layout only: every consumer's oracle derives the
  * identical pair list straight from parquet.
  */
object EdgeLayout {

  /** Per-JVM unique tag: two concurrent benches/tests on one machine
    * write disjoint locations and catalog names. */
  private val runTag: String =
    java.lang.Long.toHexString(ProcessHandle.current().pid()) + "x" +
      java.lang.Long.toHexString(System.nanoTime() & 0xffffffffL)

  /** sf-dir → (pairs table name, edges table name), written at most
    * once per JVM. */
  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def baseDir: java.io.File =
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_layout_$runTag")

  /** The one derivation both tables share: distinct (c, s) trading
    * pairs. Orders and lineitem are BOTH fact tables (each grows with
    * the corpus), so the pair join is a sort-merge join on the order
    * key — never a broadcast, which would collect a corpus-sized
    * projection to the driver at 100×. */
  private def derivePairs(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .hint("merge")
    graft.Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
  }

  private def ensure(s: SparkSession, dir: String): (String, String) =
    written.computeIfAbsent(dir, _ => {
      val k = written.size()
      val pairsName = s"graft_pairs_${runTag}_$k"
      val edgesName = s"graft_edges_${runTag}_$k"
      val pairsLoc = new java.io.File(baseDir, s"pairs_$k").getAbsolutePath
      val edgesLoc = new java.io.File(baseDir, s"edges_$k").getAbsolutePath
      // one file per bucket: repartition on the bucket key with the
      // bucket count (same murmur3 hash as the bucketed write), so
      // the read-back claims HashPartitioning(key, 32) AND the
      // per-bucket sort survives as the scan's output ordering
      derivePairs(s, dir)
        .repartition(32, col("c"))
        .write.mode("overwrite")
        .bucketBy(32, "c").sortBy("c")
        .option("path", pairsLoc)
        .saveAsTable(pairsName)
      // both edge directions from ONE explode pass over the pairs
      // table read-back (cheap: a bucketed scan, not the fact join)
      s.table(pairsName)
        .select(explode(array(
          struct(col("c").as("src"), (-(col("s") + 1)).as("dst")),
          struct((-(col("s") + 1)).as("src"), col("c").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(32, col("src"))
        .write.mode("overwrite")
        .bucketBy(32, "src").sortBy("src")
        .option("path", edgesLoc)
        .saveAsTable(edgesName)
      (pairsName, edgesName)
    })

  /** Distinct (c, s) trading pairs, bucketed by c — exchange-free
    * input for c-keyed aggregates and self-joins. */
  def pairs(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir)._1)

  /** Symmetric (src, dst) edge list (suppliers −(s+1)), bucketed by
    * src — exchange-free edge side for every vertex-program join. */
  def edges(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir)._2)
}
