package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecMathSpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    // Deterministic pseudo-random floats incl. negatives, zeros, and a
    // value that lands exactly on a quantization boundary (floor ties).
    val rows = (0L until 50L).map { id =>
      val v = (0 until 16).map { i =>
        val raw = ((id * 31 + i * 17 + 7) % 2001 - 1000).toFloat / 777f
        if ((id + i) % 13 == 0) 0f else raw
      }.toArray
      (id, v)
    } :+ (50L, Array(0.001f, -0.001f, 1.0f, -1.0f))
    rows.toDF("vec_id", "embedding")
  }

  test("QuantizeEmbedding matches the HOF transform formulation (the oracle's math)") {
    val viaKernel = vecs.select(col("vec_id"),
        VecMath.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaHof = vecs.selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint)) AS qv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaKernel === viaHof)
  }

  test("QuantizeEmbedding with a coarse scale matches the HOF formulation") {
    val viaKernel = vecs.select(col("vec_id"),
        VecMath.quantize(col("embedding"), 16L).as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaHof = vecs.selectExpr("vec_id",
        "transform(embedding, x -> cast(floor(cast(x as double) * 16) as bigint)) AS cv")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaKernel === viaHof)
  }

  test("QDot matches the HOF aggregate(zip_with) formulation") {
    val q = vecs.select(col("vec_id"), VecMath.quantize(col("embedding")).as("qv"))
    val pairs = q.select(col("vec_id").as("id_a"), col("qv").as("qv_a"))
      .crossJoin(q.select(col("vec_id").as("id_b"), col("qv").as("qv_b")))
      .filter(col("id_a") < col("id_b") && col("id_b") < col("id_a") + 5)
      // Mixed lengths never pair up in real queries; keep dims equal here.
      .filter(col("id_a") < 50 && col("id_b") < 50)
    val viaKernel = pairs.select(col("id_a"), col("id_b"),
        VecMath.qdot(col("qv_a"), col("qv_b")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaHof = pairs.selectExpr("id_a", "id_b",
        "aggregate(zip_with(qv_a, qv_b, (x, y) -> x * y), 0L, (acc, x) -> acc + x) AS dot")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaKernel === viaHof)
    assert(viaKernel.nonEmpty)
  }

  test("QDot of a vector with itself is the squared norm; null input stays null") {
    val q = vecs.select(col("vec_id"), VecMath.quantize(col("embedding")).as("qv"))
    val viaKernel = q.select(col("vec_id"), VecMath.qdot(col("qv"), col("qv")).as("qn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaHof = q.selectExpr("vec_id",
        "aggregate(qv, 0L, (acc, x) -> acc + x * x) AS qn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel === viaHof)

    import spark.implicits._
    val withNull = Seq((1L, Option(Array(0.5f))), (2L, None))
      .toDF("vec_id", "embedding")
    val out = withNull.select(col("vec_id"),
        VecMath.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out(2L) === null)
    assert(out(1L) === Seq(500L))
  }
}
