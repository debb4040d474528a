package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *   - `doclen` — (doc_id, dl) total bigram count per document: a
  *     doc-count-sized side table consumers broadcast (BM25's length
  *     normalization); persisting it avoids the doc-keyed shuffle
  *     that re-deriving it from g-bucketed postings would cost.
  *
  * The bigram definition is character-identical to the inline form
  * the oracles replay (split on single space, adjacent-token concat,
  * docs with < 2 tokens contribute nothing — the `sequence(1, 0)`
  * guard), so consuming the artifact cannot change any query's
  * result: it is a LAYOUT of the same rows, which is what the DuckDB
  * oracles continue to verify value-for-value.
  *
  * Trigram phrase postings (q159) deliberately stay inline: one
  * consumer does not earn a 1.5×-the-corpus-tokens artifact; add a
  * `phrases` table here if a second phrase consumer appears.
  */
object TextIndex {

  /** Bump when the BUILD semantics change (tokenization, gram order,
    * bucket count), so an upgraded engine never misreads an old
    * artifact as current. */
  val LayoutVersion = 1

  /** (catalog root, sf dir) → (postings location, doclen location,
    * name tag). Memoizes the resolve only — the artifact is on disk
    * and outlives the process. */
  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    String, (java.io.File, java.io.File, String)]()

  /** Test hook: forget every in-process resolve (disk untouched), so
    * a spec can prove the durable read-back path. */
  def reset(): Unit = resolved.clear()

  /** The shared derivation: adjacent-token bigrams of every document,
    * exactly as the inline consumers built them (q76/q90's
    * expression, including the size ≥ 2 guard against Spark's
    * descending `sequence(1, 0)` on single-token docs). */
  private def bigrams(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "documents")
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), " +
          "i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")).as("g"))

  private def buildInto(s: SparkSession, dir: String,
      tmp: java.io.File): Unit = {
    val bt = s"${LayoutCatalog.processTag}_${tmp.getName.hashCode.toHexString}"
    val postingsScratch = s"graft_build_postings_$bt"
    try {
      val tf = bigrams(s, dir)
        .groupBy("doc_id", "g").agg(count(lit(1)).as("tf"))
      // one file per bucket: repartition on the bucket key with the
      // bucket count so the read-back claims HashPartitioning(g, 32)
      tf.repartition(32, col("g"))
        .write.mode("overwrite")
        .bucketBy(32, "g").sortBy("g")
        .option("path", new java.io.File(tmp, "postings").getAbsolutePath)
        .saveAsTable(postingsScratch)
      // doc lengths from the postings read-back (a bucketed scan, not
      // a re-tokenize); doc-count-sized, plain parquet — consumers
      // broadcast it
      s.table(postingsScratch)
        .groupBy("doc_id").agg(sum(col("tf")).as("dl"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(new java.io.File(tmp, "doclen").getAbsolutePath)
    } finally {
      s.sql(s"DROP TABLE IF EXISTS $postingsScratch")
    }
  }

  /** Idempotent per-session registration of the published bucketed
    * postings (same contract as [[EdgeLayout]]): CREATE TABLE over
    * the existing files re-attaches the bucket-spec metadata. */
  private def registerIfAbsent(s: SparkSession, name: String,
      loc: java.io.File): Unit =
    if (!s.catalog.tableExists(name))
      s.sql(s"""CREATE TABLE IF NOT EXISTS $name (doc_id BIGINT, g STRING, tf BIGINT)
               |USING PARQUET
               |CLUSTERED BY (g) SORTED BY (g) INTO 32 BUCKETS
               |LOCATION '${loc.getAbsolutePath}'""".stripMargin)

  private def ensure(s: SparkSession, dir: String): (String, java.io.File) = {
    val key = LayoutCatalog.root.getAbsolutePath + "|" + dir
    val (postingsLoc, doclenLoc, tag) = resolved.computeIfAbsent(key, _ => {
      val fp = LayoutCatalog.fingerprint(dir, Seq("documents"))
      val dest = LayoutCatalog.publishedDir(s"lexical_v$LayoutVersion",
        LayoutCatalog.sanitize(dir), fp)
      LayoutCatalog.buildAndPublish(dest, tmp => buildInto(s, dir, tmp))
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

  /** (doc_id, g, tf) bigram postings, bucketed by g — exchange-free
    * input for g-keyed aggregates, idf joins, and posting-list
    * self-joins. */
  def bigramPostings(s: SparkSession, dir: String): DataFrame =
    s.table(ensure(s, dir)._1)

  /** (doc_id, dl) total bigram count per document — doc-count-sized;
    * consumers broadcast it. */
  def docLengths(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensure(s, dir)._2.getAbsolutePath)
}
