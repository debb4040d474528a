package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch operating-point sweep for the IVF-PQ search (not part of
  * the driver contract): measures recall@5 of the q286 search shape —
  * probe → ADC → shortlist → exact rerank — against the driver-side
  * brute-force top-5, plus steady-state latency, across
  * (nCentroids, nProbe, replication, shortlist) configs. Run with a
  * scratch layout root so sweep artifacts never pollute the real
  * catalog:
  *
  *   java ... -Dgraft.layout.root=/tmp/pq_sweep graft.PqSweep \
  *     8,2,3,100 16,2,3,100 16,4,3,100 32,4,3,100
  */
object PqSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = bruteTop5(spark, sfDir)
    for (a <- args) {
      val Array(k, p, r, sl) = a.split(",").map(_.trim.toInt)
      val (recall, sec) = run(spark, sfDir, k, p, r, sl, exact)
      println(f"[pqsweep] k=$k%-3d probe=$p%-2d repl=$r shortlist=$sl%-4d " +
        f"recall@5=$recall%.3f steady=$sec%.2fs")
    }
    spark.stop()
  }

  private def quantizedBase(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VecMath.quantize(col("embedding")).as("qv"))
      .withColumn("qn", graft.functions.VecMath.qdot(col("qv"), col("qv")))
      .filter(col("qn") > 0)
      .select("vec_id", "qv", "qn")

  /** Driver-side exact cosine top-5 per query id < 20 — ground truth. */
  def bruteTop5(s: SparkSession, dir: String): Map[Long, Set[Long]] = {
    val vecs = quantizedBase(s, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / math.sqrt(dot(a, a).toDouble * dot(b, b).toDouble)
    vecs.keys.filter(_ < 20).map { qid =>
      qid -> vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(vecs(qid), v)) }
        .sortBy { case (id, sc) => (-sc, id) }.take(5).map(_._1).toSet
    }.toMap
  }

  def run(s: SparkSession, dir: String, k: Int, nProbe: Int, repl: Int,
      shortlist: Int, exact: Map[Long, Set[Long]]): (Double, Double) = {
    val qd = graft.functions.VecMath.qdot _
    val base = quantizedBase(s, dir)
    val cents = graft.operators.Ivf.persistedCentroidsCosine(
      base, dir, "vec_id", "qv", k, 2)
    val (codes, cbt) = graft.operators.IvfPq.persistedIndex(
      base, dir, cents, k, 2, repl)
    val cw = cents.select("centroid_id", "cv")
    def search(): DataFrame = {
      val queries = base.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
          col("qn").as("qqn"))
      val qc = graft.operators.Ivf
        .probeCosine(queries, "qqv", cents, nProbe)
        .join(broadcast(cw), "centroid_id")
        .withColumn("dqc",
          graft.functions.VecMath.qdot(col("qqv"), col("cv")))
        .select("query_id", "qqn", "centroid_id", "dqc")
      val lut = queries.crossJoin(broadcast(cbt))
        .withColumn("ip", qd(
          expr("slice(qqv, cast(subspace * 8 + 1 as int), 8)"), col("cw")))
        .select("query_id", "subspace", "code", "ip")
      val adc = codes
        .join(broadcast(qc), "centroid_id")
        .filter(col("vec_id") =!= col("query_id"))
        .join(broadcast(lut), Seq("query_id", "subspace", "code"))
        .groupBy("query_id", "vec_id", "centroid_id", "qn", "qqn", "dqc")
        .agg(sum(col("ip")).as("ipsum"))
        .withColumn("adot", col("dqc") + col("ipsum"))
      val best = adc.groupBy("query_id", "vec_id", "qn", "qqn")
        .agg(max(col("adot")).as("adot"))
        .withColumn("score_a", col("adot").cast("double") /
          sqrt(col("qqn").cast("double") * col("qn").cast("double")))
      val wa = Window.partitionBy("query_id")
        .orderBy(desc("score_a"), col("vec_id"))
      val short = best.withColumn("arn", row_number().over(wa))
        .filter(col("arn") <= shortlist).select("query_id", "vec_id", "adot")
      val rer = short
        .join(broadcast(queries), "query_id")
        .join(base.select(col("vec_id"), col("qv").as("qv_c"),
          col("qn").as("qn_c")), "vec_id")
        .withColumn("score", qd(col("qqv"), col("qv_c")).cast("double") /
          sqrt(col("qqn").cast("double") * col("qn_c").cast("double")))
      val wr = Window.partitionBy("query_id")
        .orderBy(desc("score"), col("vec_id"))
      rer.withColumn("rnk", row_number().over(wr).cast("long"))
        .filter(col("rnk") <= 5)
        .select("query_id", "vec_id", "rnk")
    }
    // recall@5 against the exact truth
    val got = search().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet }
    val hits = exact.map { case (q, t) =>
      got.getOrElse(q, Set.empty).count(t) }.sum
    val recall = hits.toDouble / (exact.size * 5)
    // steady-state latency: min of 3 timed passes after one warm-up
    search().queryExecution.toRdd.count()
    val sec = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      search().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    (recall, sec)
  }
}
