package graft.operators

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Durable EXACT near-dup pair graph — q299's prefix-filtered
  * Jaccard-0.7 self-join published as a corpus-keyed
  * [[LayoutCatalog]] artifact, so the tokenize → gram → prefix-join →
  * verify derivation is paid ONCE per corpus snapshot instead of once
  * per consumer.
  *
  * Before round 14, q299 (the pair list), q307 (dedup groups = CC
  * over the pairs) and q310 (canonical exemplars) would each re-run
  * the whole derivation — q307's bench cost was dominated by
  * re-paying q299. This is the same pay-at-ingest contract as
  * [[EdgeLayout]] and [[TextIndex]]: the pair graph is exactly the
  * kind of artifact a production dedup pipeline materializes (it IS
  * the dedup decision input), every consumer reads the published
  * parquet, and a changed corpus snapshot fingerprints to a new
  * directory — never a silent stale read.
  *
  * Artifact: `pairs07_v1/<corpus>_<fp>/pairs` — all pairs with
  * word-5-gram Jaccard ≥ 0.7 as (doc_a < doc_b, sza, szb, n_common),
  * the integer-exact frame both q299's ratio projection and q307's
  * components derive from. Pair-count-sized (O(n) in corpus size
  * times dup-family density — the bounded quantity the prefix filter
  * exists to keep join-shaped), written hash-distributed on doc_a.
  *
  * Derivation semantics are UNCHANGED from q299 (scaladoc there;
  * BlockingSpec pins ≡ brute force): docs under 5 tokens drop before
  * sequence, grams are md5-relabeled distinct word-5-grams, prefix =
  * first sz − ⌈0.7·sz⌉ + 1 grams under global (df ASC, g ASC) order,
  * candidates add both length filters, verify is candidate-bounded
  * with the codegen'd sorted-intersect kernel, threshold in integers
  * (17c ≥ 7(sza+szb)). The oracle side of every consumer keeps
  * verifying all-pairs from raw parquet — the artifact is a layout,
  * never a semantic.
  */
object PairGraph {

  /** Bump when the BUILD semantics change, so an upgraded engine
    * never misreads an old artifact as current. */
  val LayoutVersion = 1

  /** Memoized resolve (fingerprint in the key: a corpus that changes
    * within one JVM must re-resolve, not serve the stale artifact). */
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[String, File]()

  /** Test hook: clears the in-process memo — what a new JVM sees. */
  def reset(): Unit = resolved.clear()

  /** All document pairs with word-5-gram Jaccard ≥ 0.7:
    * `(doc_a, doc_b, sza, szb, n_common)` with doc_a < doc_b —
    * resolved from the published artifact, building it first if this
    * corpus snapshot has none. */
  def qualifyingPairs(s: SparkSession, dir: String): DataFrame = {
    val fp = LayoutCatalog.fingerprint(dir, Seq("documents"))
    val key = LayoutCatalog.root.getAbsolutePath + "|" + dir + "|" + fp
    val loc = resolved.computeIfAbsent(key, _ => {
      val dest = LayoutCatalog.publishedDir(s"pairs07_v$LayoutVersion",
        LayoutCatalog.sanitize(dir), fp)
      LayoutCatalog.buildAndPublish(dest, tmp =>
        derive(s, dir)
          .repartition(32, col("doc_a"))
          .write.mode("overwrite")
          .parquet(new File(tmp, "pairs").getAbsolutePath))
      new File(dest, "pairs")
    })
    s.read.parquet(loc.getAbsolutePath)
  }

  /** CAPPED-OUTPUT exact dedup: canonical exemplar per document,
    * computed by streaming the qualifying-pair derivation straight
    * into a per-doc aggregate — `(doc_id, exemplar, n_partners)` for
    * every doc in ≥ 1 qualifying pair, where exemplar = MIN over
    * {self} ∪ partners and n_partners counts qualifying partners.
    *
    * This is the 100 TB-honest variant of q299: the full pair list is
    * quadratic in dup-family density (a 1000-doc family is 500 k
    * pairs — measured 2.67 B pairs at the 25× rung for the banded
    * family), and a deployment that only needs keep/drop decisions
    * should never MATERIALIZE it. Here the verified pair stream feeds
    * directly into groupBy(doc).min/count — Spark's partial
    * aggregation collapses pairs map-side, so the pair set exists
    * only as an in-flight iterator: the post-verify shuffle and the
    * output are both O(docs), never O(pairs). (Deliberately NOT read
    * from the pairs07 artifact: that artifact IS the quadratic
    * materialization this variant exists to avoid.)
    *
    * Exemplar is the DIRECT-neighbor minimum — the per-doc capped
    * contract; q307 gives the transitive grouping when chains matter. */
  def exemplars(s: SparkSession, dir: String): DataFrame = {
    // both directions via ONE explode over the single verified pair
    // stream — a self-union of two projections would re-execute the
    // whole derivation per branch (measured 2× at the 25× rung)
    val directed = derive(s, dir).select(explode(array(
        struct(col("doc_a").as("d"), col("doc_b").as("p")),
        struct(col("doc_b").as("d"), col("doc_a").as("p")))).as("e"))
      .select(col("e.d").as("d"), col("e.p").as("p"))
    directed.groupBy("d")
      .agg(min(col("p")).as("mn"), count(lit(1)).as("n_partners"))
      .select(col("d").as("doc_id"),
        least(col("d"), col("mn")).as("exemplar"), col("n_partners"))
  }

  /** The from-scratch derivation (q299's original body). ONE
    * materialized doc-array table serves every downstream reference:
    * the exploded gram stream derives from it (df aggregate + prefix
    * ranking re-explode cached blocks, not the tokenize+md5 chain),
    * and the verify step never touches the gram-row space — it joins
    * the CANDIDATE-sized pair frame to the doc-count-sized table
    * twice and counts intersections with one linear merge per pair
    * (codegen'd sorted_intersect_count_str). */
  private def derive(s: SparkSession, dir: String): DataFrame = {
    val sh = graft.Tables.load(s, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(tk) - 4), " +
          "i -> md5(concat_ws(' ', slice(tk, i, 5)))))").as("grams"))
      .withColumn("sz", size(col("grams")).cast("long"))
    val docsArr = graft.Checkpoints.materialize(
      sh.select(col("doc_id"), col("sz"), sort_array(col("grams")).as("grams")))
    val g = docsArr.select(col("doc_id"), col("sz"), explode(col("grams")).as("g"))
    val dfq = g.groupBy("g").agg(count(lit(1)).as("df"))
    // prefix = first (sz − ⌈0.7·sz⌉ + 1) grams under (df, g) order;
    // integer ceil: ⌈7·sz/10⌉ = (7·sz + 9) div 10
    val prefix = g.join(dfq, "g")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("g"))))
      .filter(col("rn") <= col("sz") - expr("(7 * sz + 9) div 10") + 1)
      .select(col("doc_id"), col("sz"), col("g"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("b.doc_id") > col("a.doc_id") &&
          lit(10) * col("b.sz") >= lit(7) * col("a.sz") &&
          lit(10) * col("a.sz") >= lit(7) * col("b.sz"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .distinct()
    cand
      .join(docsArr.select(col("doc_id").as("doc_a"), col("grams").as("ga")),
        "doc_a")
      .join(docsArr.select(col("doc_id").as("doc_b"), col("grams").as("gb")),
        "doc_b")
      .withColumn("n_common",
        graft.functions.Jaccard.sortedIntersectCountStr(col("ga"), col("gb")))
      .filter(lit(17) * col("n_common") >= lit(7) * (col("sza") + col("szb")))
      .select("doc_a", "doc_b", "sza", "szb", "n_common")
  }
}
