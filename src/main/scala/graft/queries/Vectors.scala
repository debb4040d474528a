package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operators over `embeddings` (array<float>, dim 64).
  *
  * Cross-engine determinism: floats are quantized to BIGINT with
  * floor(x * 1000) before any reduction, so dot products and norms are
  * exact integer arithmetic (order-free); the only float op left is one
  * division by one sqrt on identical operands — bit-identical in both
  * engines.
  *
  * Scale notes: the brute-force top-k broadcasts the (small) query set
  * and never shuffles the candidate side; the LSH variant buckets by
  * sign-random-projection so near-dup search becomes a hash-partitioned
  * groupBy/join on the bucket key instead of a cross join.
  */
object Vectors {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Quantized embedding, Spark side. */
  private val qvExpr =
    "transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))"
  private val qvSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** Integer squared-norm of the quantized vector. */
  private val qnormExpr = "aggregate(qv, 0L, (acc, x) -> acc + x * x)"
  private val qnormSql =
    "CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT)"

  /** Sign-random-projection plane j: weight(i) = ((i*(j+3) + 7) % 11) - 5. */
  private def planeDotExpr(j: Int): String =
    s"aggregate(zip_with(qv, transform(sequence(1, size(qv)), i -> cast((i * ${j + 3} + 7) % 11 - 5 as bigint)), (x, w) -> x * w), 0L, (acc, x) -> acc + x)"
  private def planeDotSql(j: Int): String =
    s"CAST(list_aggregate(list_transform(range(1, len(qv) + 1), i -> qv[i] * ((i * ${j + 3} + 7) % 11 - 5)), 'sum') AS BIGINT)"

  private def quantized(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), expr(qvExpr).as("qv"))
      .withColumn("qn", expr(qnormExpr))

  private val quantizedSql =
    s"""SELECT vec_id, label, qv, $qnormSql AS qn FROM (
          SELECT vec_id, label, $qvSql AS qv FROM embeddings) q1"""

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q36
    // Brute-force cosine top-k: queries (vec_id < 20) broadcast against
    // all candidates; rank by (score desc, vec_id) — fully deterministic.
    Q(
      "q36_cosine_topk",
      Some(s"""
        WITH normed AS ($quantizedSql),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 CAST(CAST(list_aggregate(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.qv[i]), 'sum') AS BIGINT) AS DOUBLE)
                   / sqrt(CAST(q.qn AS DOUBLE) * CAST(c.qn AS DOUBLE)) AS score
          FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < 20 AND q.qn > 0 AND c.qn > 0)
        SELECT query_id, vec_id, score FROM (
          SELECT query_id, vec_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
          FROM scored) t
        WHERE rn <= 5""")
    ) { (s, dir) =>
      val normed = quantized(s, dir).filter(col("qn") > 0)
      val q = normed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("qn").as("qqn"))
      val scored = normed.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qqv, qv, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
        .withColumn("score",
          col("dot").cast("double") / sqrt(col("qqn").cast("double") * col("qn").cast("double")))
      val w = Window.partitionBy("query_id").orderBy(desc("score"), col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("query_id", "vec_id", "score")
    },

    // ---------------------------------------------------------------- q40
    // Same top-k semantics as q36, computed with the bounded-heap
    // TopKAggregator (custom typed Aggregator) instead of a
    // row_number window: map-side partial top-k means O(groups × k)
    // shuffle bytes instead of shipping every scored candidate — the
    // plan that survives a 100× candidate-count scale-up.
    Q(
      "q40_cosine_topk_heap",
      Some(s"""
        WITH normed AS ($quantizedSql),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 CAST(CAST(list_aggregate(list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.qv[i]), 'sum') AS BIGINT) AS DOUBLE)
                   / sqrt(CAST(q.qn AS DOUBLE) * CAST(c.qn AS DOUBLE)) AS score
          FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
          WHERE q.vec_id < 20 AND q.qn > 0 AND c.qn > 0)
        SELECT query_id, vec_id, score FROM (
          SELECT query_id, vec_id, score,
                 ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
          FROM scored) t
        WHERE rn <= 5""")
    ) { (s, dir) =>
      val normed = quantized(s, dir).filter(col("qn") > 0)
      val q = normed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("qv").as("qqv"), col("qn").as("qqn"))
      val scored = normed.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .withColumn("dot",
          expr("aggregate(zip_with(qqv, qv, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
        .withColumn("score",
          col("dot").cast("double") / sqrt(col("qqn").cast("double") * col("qn").cast("double")))
      val topk = udaf(new graft.functions.TopKAggregator(5),
        graft.functions.TopK.inputEncoder)
      scored
        .groupBy(col("query_id"))
        .agg(topk(col("vec_id"), col("score")).as("topk"))
        .select(col("query_id"), explode(col("topk")).as("hit"))
        .select(col("query_id"), col("hit.vec_id").as("vec_id"),
          col("hit.score").as("score"))
    },

    // ---------------------------------------------------------------- q37
    // Per-label embedding statistics over the quantized vectors.
    Q(
      "q37_embedding_stats",
      Some(s"""
        WITH normed AS ($quantizedSql)
        SELECT label, COUNT(*) AS n,
               CAST(SUM(qn) AS BIGINT) AS total_qnorm,
               CAST(SUM(qn) AS DOUBLE) / COUNT(*) AS avg_qnorm,
               CAST(MIN(qn) AS BIGINT) AS min_qnorm,
               CAST(MAX(qn) AS BIGINT) AS max_qnorm
        FROM normed GROUP BY label""")
    ) { (s, dir) =>
      quantized(s, dir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("qn")).as("total_qnorm"),
          (sum(col("qn")).cast("double") / count(lit(1))).as("avg_qnorm"),
          min(col("qn")).as("min_qnorm"),
          max(col("qn")).as("max_qnorm"))
    },

    // ---------------------------------------------------------------- q38
    // LSH bucketing by sign-random-projection (4 planes -> 16 buckets):
    // the scale path for ANN — bucket is the shuffle/join key.
    Q(
      "q38_lsh_buckets",
      Some(s"""
        WITH qd AS (SELECT vec_id, label, $qvSql AS qv FROM embeddings)
        SELECT vec_id, label,
               (CASE WHEN ${planeDotSql(0)} >= 0 THEN 1 ELSE 0 END)
             + (CASE WHEN ${planeDotSql(1)} >= 0 THEN 2 ELSE 0 END)
             + (CASE WHEN ${planeDotSql(2)} >= 0 THEN 4 ELSE 0 END)
             + (CASE WHEN ${planeDotSql(3)} >= 0 THEN 8 ELSE 0 END) AS bucket
        FROM qd""")
    ) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), expr(qvExpr).as("qv"))
        .select(col("vec_id"), col("label"),
          ((when(expr(planeDotExpr(0)) >= 0, 1).otherwise(0))
            + (when(expr(planeDotExpr(1)) >= 0, 2).otherwise(0))
            + (when(expr(planeDotExpr(2)) >= 0, 4).otherwise(0))
            + (when(expr(planeDotExpr(3)) >= 0, 8).otherwise(0))).as("bucket"))
    },

    // ---------------------------------------------------------------- q39
    // Embedding-cosine near-dup pairs, LSH-blocked: candidates only form
    // within a bucket (self-join on the bucket key, not a cross join),
    // then exact cosine verifies. Deterministic: integer dot + one sqrt.
    Q(
      "q39_cosine_neardup",
      Some(s"""
        WITH qd AS (SELECT vec_id, $qvSql AS qv FROM embeddings),
        withb AS (
          SELECT vec_id, qv,
                 CAST(list_aggregate(list_transform(qv, x -> x * x), 'sum') AS BIGINT) AS qn,
                 (CASE WHEN ${planeDotSql(0)} >= 0 THEN 1 ELSE 0 END)
               + (CASE WHEN ${planeDotSql(1)} >= 0 THEN 2 ELSE 0 END)
               + (CASE WHEN ${planeDotSql(2)} >= 0 THEN 4 ELSE 0 END)
               + (CASE WHEN ${planeDotSql(3)} >= 0 THEN 8 ELSE 0 END) AS bucket
          FROM qd)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(CAST(list_aggregate(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i]), 'sum') AS BIGINT) AS DOUBLE)
                 / sqrt(CAST(a.qn AS DOUBLE) * CAST(b.qn AS DOUBLE)) AS score
        FROM withb a JOIN withb b ON a.bucket = b.bucket AND b.vec_id > a.vec_id
        WHERE a.qn > 0 AND b.qn > 0
          AND CAST(CAST(list_aggregate(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i]), 'sum') AS BIGINT) AS DOUBLE)
                 / sqrt(CAST(a.qn AS DOUBLE) * CAST(b.qn AS DOUBLE)) >= 0.30""")
    ) { (s, dir) =>
      val withb = t(s, dir, "embeddings")
        .select(col("vec_id"), expr(qvExpr).as("qv"))
        .withColumn("qn", expr(qnormExpr))
        .filter(col("qn") > 0)
        .withColumn("bucket",
          (when(expr(planeDotExpr(0)) >= 0, 1).otherwise(0))
            + (when(expr(planeDotExpr(1)) >= 0, 2).otherwise(0))
            + (when(expr(planeDotExpr(2)) >= 0, 4).otherwise(0))
            + (when(expr(planeDotExpr(3)) >= 0, 8).otherwise(0)))
      val a = withb.select(col("vec_id").as("vec_a"), col("qv").as("qv_a"),
        col("qn").as("qn_a"), col("bucket"))
      val b = withb.select(col("vec_id").as("vec_b"), col("qv").as("qv_b"),
        col("qn").as("qn_b"), col("bucket").as("bucket_b"))
      a.join(b, col("bucket") === col("bucket_b") && col("vec_b") > col("vec_a"))
        .withColumn("dot",
          expr("aggregate(zip_with(qv_a, qv_b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
        .withColumn("score",
          col("dot").cast("double") / sqrt(col("qn_a").cast("double") * col("qn_b").cast("double")))
        .filter(col("score") >= 0.30)
        .select("vec_a", "vec_b", "score")
    },
  )
}
