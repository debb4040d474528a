package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable IVF-PQ index — the fourth [[LayoutCatalog]] artifact: the
  * PQ code table and trained residual codebook that q286's ADC search
  * reads. Building them (r-way cell assignment, per-copy residuals,
  * one integer Lloyd round on the per-subspace codebook, code argmin)
  * is INGEST work: at 100 TB the codes table is the index a thousand
  * query jobs share, so it publishes once per corpus snapshot exactly
  * like the bucketed edge corpus and the trained centroids — a
  * second JVM resolves both tables from disk and pays only
  * ADC + rerank (measured: the in-query build was 4.6-5.4 s steady
  * at sf0.1; the persisted read-back drops the search query to the
  * ADC join itself).
  *
  * Determinism: every stage is the same exact-integer arithmetic the
  * DuckDB oracle replays (floor-mean Lloyd, (d, code) argmin ties to
  * the smaller code), so the persisted tables are bit-identical to a
  * rebuild — which is what lets the oracle keep hash-matching a
  * query that reads them.
  *
  * Schema: `codes` (vec_id, centroid_id, qn, subspace, code) — one
  * row per indexed copy per subspace, carrying the exact self-norm
  * the cosine ADC normalizes by; `codebook` (subspace, code, cw) —
  * 8×16 rows of 8-dim integer codewords.
  */
object IvfPq {

  /** Bump when the BUILD semantics change. */
  val LayoutVersion = 1

  private val resolved = new java.util.concurrent.ConcurrentHashMap[
    String, (java.io.File, java.io.File)]()

  /** Test hook: forget every in-process resolve (disk untouched). */
  def reset(): Unit = resolved.clear()

  private def buildInto(base: DataFrame, cents: DataFrame,
      replication: Int, tmp: java.io.File): Unit = {
    val qd = graft.functions.VecMath.qdot _
    val cw = cents.select("centroid_id", "cv")
    // r-way cell assignment + per-copy residuals
    val res = graft.Checkpoints.materialize(
      Ivf.probeCosine(base, "qv", cents, replication)
        .join(broadcast(cw), "centroid_id")
        .withColumn("rv", expr("zip_with(qv, cv, (x, y) -> x - y)"))
        .select("vec_id", "centroid_id", "qn", "rv"))
    // codebook seed: PRIMARY (best-cell) residuals of the 16 lowest
    // ids, sliced into per-subspace 8-dim codewords
    val cb0s = Ivf.probeCosine(base.filter(col("vec_id") < 16), "qv", cents, 1)
      .join(broadcast(cw), "centroid_id")
      .withColumn("crv", expr("zip_with(qv, cv, (x, y) -> x - y)"))
      .withColumn("subspace", explode(sequence(lit(0L), lit(7L))))
      .withColumn("cw", expr("slice(crv, cast(subspace * 8 + 1 as int), 8)"))
      .select(col("vec_id").as("code"), col("subspace"), col("cw"))
    // distances as codegen'd kernels: d = sn + cn2 − 2·qdot (the
    // interpreted HOF form was 6× slower — the q209 lesson)
    val resSub = res
      .withColumn("subspace", explode(sequence(lit(0L), lit(7L))))
      .withColumn("sl", expr("slice(rv, cast(subspace * 8 + 1 as int), 8)"))
      .withColumn("sn", qd(col("sl"), col("sl")))
      .select("vec_id", "centroid_id", "qn", "subspace", "sl", "sn")
    def withCn2(cb: DataFrame) = cb.withColumn("cn2", qd(col("cw"), col("cw")))
    // ONE deterministic Lloyd round on the residual codebook (same
    // integer floor-mean as Ivf.lloydStep, per subspace; empty
    // codewords keep their seed). Struct min = lexicographic
    // (d, code); pairs are unique per group so the carried slice is
    // never consulted.
    val casg = resSub.join(broadcast(withCn2(cb0s)), "subspace")
      .withColumn("d",
        col("sn") + col("cn2") - lit(2L) * qd(col("sl"), col("cw")))
      .groupBy("vec_id", "centroid_id", "subspace")
      .agg(min(struct(col("d"), col("code"), col("sl"))).as("m"))
      .select(col("subspace"), col("m.code").as("code"), col("m.sl").as("sl"))
    val cpos = casg
      .select(col("subspace"), col("code"),
        posexplode(col("sl")).as(Seq("pos", "x")))
      .groupBy("subspace", "code", "pos")
      .agg(sum(col("x")).as("sv"), count(lit(1)).as("cnt"))
      .withColumn("m", expr("sv div cnt"))
    val cbt0 = cpos.groupBy("subspace", "code")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .as("cwt"))
    val cbt = graft.Checkpoints.materialize(
      cb0s.join(cbt0, Seq("subspace", "code"), "left")
        .withColumn("cw", coalesce(col("cwt"), col("cw")))
        .select("subspace", "code", "cw"))
    cbt.coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(tmp, "codebook").getAbsolutePath)
    resSub.join(broadcast(withCn2(cbt)), "subspace")
      .withColumn("d",
        col("sn") + col("cn2") - lit(2L) * qd(col("sl"), col("cw")))
      .groupBy("vec_id", "centroid_id", "qn", "subspace")
      .agg(min(struct(col("d"), col("code"))).as("m"))
      .select(col("vec_id"), col("centroid_id"), col("qn"),
        col("subspace"), col("m.code").as("code"))
      .write.mode("overwrite")
      .parquet(new java.io.File(tmp, "codes").getAbsolutePath)
  }

  /** Resolve (codes, codebook) for `dir`'s embeddings under the given
    * trained centroids — from disk when the corpus-fingerprinted
    * artifact exists, building and publishing it otherwise. `base`
    * must carry (vec_id, qv, qn). */
  def persistedIndex(base: DataFrame, dir: String, cents: DataFrame,
      nCentroids: Int, rounds: Int, replication: Int)
      : (DataFrame, DataFrame) = {
    import graft.operators.{LayoutCatalog => LC}
    val spark = base.sparkSession
    val key = s"${LC.root.getAbsolutePath}|$dir|$nCentroids|$rounds|$replication|pq"
    val (codesLoc, cbLoc) = resolved.computeIfAbsent(key, _ => {
      val fp = LC.fingerprint(dir, Seq("embeddings"))
      val dest = LC.publishedDir(s"ivfpq_v$LayoutVersion",
        s"${LC.sanitize(dir)}_k${nCentroids}_r${rounds}_x$replication", fp)
      LC.buildAndPublish(dest, tmp => buildInto(base, cents, replication, tmp))
      (new java.io.File(dest, "codes"), new java.io.File(dest, "codebook"))
    })
    (spark.read.parquet(codesLoc.getAbsolutePath),
      spark.read.parquet(cbLoc.getAbsolutePath))
  }
}
