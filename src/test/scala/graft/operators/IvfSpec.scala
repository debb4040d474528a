package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Properties of the IVF ANN operator: assignment is a total
  * deterministic partition of the candidates, probing more cells only
  * adds candidates, and an integer Lloyd step does not worsen the
  * clustering objective. */
class IvfSpec extends SparkSpec {

  private def base: DataFrame =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("qv"))
      .withColumn("qn", expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))
      .filter(col("qn") > 0)
      .select("vec_id", "qv", "qn")

  test("assignment is a total partition with in-range centroid ids") {
    val cents = Ivf.seedCentroids(base, "vec_id", "qv", 8)
    assert(cents.count() === 8L)
    val assigned = Ivf.assign(base, "qv", cents)
    assert(assigned.count() === base.count(), "every vector gets exactly one cell")
    val ids = assigned.select("centroid_id").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(ids.forall(i => i >= 0 && i < 8))
    // deterministic: second run produces the identical assignment
    val again = Ivf.assign(base, "qv", cents)
      .select("vec_id", "centroid_id").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val first = assigned.select("vec_id", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(first === again)
  }

  test("probing more cells only adds (query, cell) pairs; nProbe=all covers brute force") {
    val cents = Ivf.seedCentroids(base, "vec_id", "qv", 8)
    val queries = base.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    def probePairs(p: Int): Set[(Long, Int)] =
      Ivf.probe(queries, "qqv", cents, p).select("query_id", "centroid_id")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val p1 = probePairs(1)
    val p2 = probePairs(2)
    val all = probePairs(8)
    assert(p1.subsetOf(p2) && p2.subsetOf(all))
    assert(all.size === queries.count() * 8,
      "probing every cell must enumerate the full candidate space")
  }

  test("cosProbe kernel equals the interpreted HOF formulation, id for id") {
    // the codegen'd top-r kernel (round 11 — the ingest hot loop once
    // nCentroids rides the √n ladder) must be BIT-identical to the
    // array_sort(transform(...)) + slice expression it replaced: same
    // IEEE key 2 − dot/√cn, same 1e308 zero-mass sink, same id
    // tiebreak, same slice semantics when r exceeds the cell count
    val cents = Ivf.trainCentroidsCosine(base, "vec_id", "qv", 8, 2)
    val centArr = cents.agg(collect_list(struct(col("centroid_id"), col("cv"),
      expr("aggregate(transform(cv, x -> x * x), 0L, (acc, x) -> acc + x)")
        .as("cn"))).as("__cents"))
    Seq(1, 2, 4, 8, 16).foreach { r =>
      val both = base.crossJoin(broadcast(centArr))
        .withColumn("kernel",
          graft.functions.VecMath.cosProbe(col("qv"), col("__cents"), r))
        .withColumn("hof", expr(
          s"""transform(
                slice(array_sort(transform(__cents, c ->
                  struct(${Ivf.cosKeyExpr("qv")} AS k,
                         c.centroid_id AS centroid_id))), 1, $r),
                p -> p.centroid_id)"""))
      assert(both.filter(not(col("kernel") === col("hof"))).count() === 0,
        s"kernel and HOF probe lists must match at r=$r")
    }
  }

  test("integer Lloyd step does not worsen the clustering objective") {
    def objective(assigned: DataFrame, cents: DataFrame): Long =
      assigned.select("vec_id", "qv", "centroid_id")
        .join(cents, "centroid_id")
        .withColumn("d", expr(Ivf.sqDistExpr("qv", "cv")))
        .agg(sum("d")).head().getLong(0)
    val cents0 = Ivf.seedCentroids(base, "vec_id", "qv", 8)
    val assigned0 = Ivf.assign(base, "qv", cents0)
    val obj0 = objective(assigned0, cents0)
    val cents1 = Ivf.lloydStep(assigned0, "qv")
    val assigned1 = Ivf.assign(base, "qv", cents1)
    val obj1 = objective(assigned1, cents1)
    assert(obj1 <= obj0,
      s"Lloyd step worsened the objective: $obj0 -> $obj1")
    // refined centroids keep the vector dimensionality
    val dims = cents1.select(size(col("cv"))).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq === Seq(64))
  }
}
