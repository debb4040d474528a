package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate-nearest-neighbour over quantized
  * embedding vectors (`array<bigint>`) — the centroid-partitioned
  * scale path beside the LSH route (`operators/Lsh`).
  *
  * Data flow at scale: a small centroid table (`nCentroids` ~ √n) is
  * BROADCAST; every candidate vector is assigned to its nearest
  * centroid map-side (one projection over a broadcast array — no
  * shuffle, no per-row join); queries probe their `nProbe` nearest
  * centroids and only candidates in probed cells are ever scored, so
  * the scored-pair count drops from n·q (brute force, q36) to
  * ~(nProbe/nCentroids)·n·q. With the (tiny) probe side broadcast the
  * whole search is map-side until the final per-query top-k.
  *
  * Determinism (cross-engine): centroid "training" is deterministic —
  * seeds are the `nCentroids` smallest-id vectors, refinement is
  * integer Lloyd (element-wise floor-div means), distances are exact
  * BIGINT squared-L2, and every argmin carries a centroid_id
  * tiebreak. Every step replays exactly in DuckDB (see the q60
  * oracle). At production scale the seeding would be a k-means|| pass;
  * the operator's data flow — broadcast centroids, map-side assign,
  * probed-cell search — is unchanged by how centroids are chosen.
  */
object Ivf {

  /** nCentroids cells, each query probes the nProbe nearest. nProbe
    * is THE recall/cost knob: probed cells are prefix-nested, so
    * recall@k is monotone non-decreasing in nProbe, reaching exactly
    * 1.0 at nProbe = nCentroids (exhaustive probe). q146 publishes
    * the measured recall-vs-probe curve; q65 the default operating
    * point. */
  final case class Config(nCentroids: Int, nProbe: Int) {
    require(nCentroids >= 1 && nProbe >= 1 && nProbe <= nCentroids,
      "need 1 <= nProbe <= nCentroids")
  }

  /** Exact integer squared-L2 between two array<bigint> columns. */
  def sqDistExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x)"

  /** DuckDB replay of [[sqDistExpr]]. */
  def sqDistSql(a: String, b: String): String =
    s"CAST(list_aggregate(list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), 'sum') AS BIGINT)"

  /** Deterministic seed centroids: the quantized vectors of the
    * `n` smallest ids, numbered 0..n-1 in id order. Output:
    * (centroid_id int, cv array<bigint>). The single-partition window
    * is fine — the centroid table is tiny by construction. */
  def seedCentroids(df: DataFrame, idCol: String, qvCol: String, n: Int): DataFrame =
    df.orderBy(col(idCol)).limit(n)
      .select(col(idCol), col(qvCol))
      .withColumn("centroid_id",
        (row_number().over(Window.orderBy(col(idCol))) - 1).cast("int"))
      .select(col("centroid_id"), col(qvCol).as("cv"))

  /** The broadcast one-row centroid array both [[assign]] and
    * [[probe]] cross-join in: array<struct<centroid_id, cv>>. */
  private def centroidArray(centroids: DataFrame): DataFrame =
    centroids.agg(collect_list(struct(col("centroid_id"), col("cv"))).as("__cents"))

  /** Adds `centroid_id`: the nearest centroid of `qvCol` (exact
    * integer squared-L2, ties to the smallest centroid_id). Map-side
    * only — the argmin runs inside one projection over the broadcast
    * centroid array; no shuffle, no row explosion. */
  def assign(df: DataFrame, qvCol: String, centroids: DataFrame): DataFrame =
    df.crossJoin(broadcast(centroidArray(centroids)))
      .withColumn("centroid_id", expr(
        s"""array_min(transform(__cents, c ->
              struct(${sqDistExpr(qvCol, "c.cv")} AS dist,
                     c.centroid_id AS centroid_id))).centroid_id"""))
      .drop("__cents")

  /** One integer Lloyd refinement: new centroid = element-wise
    * floor-div mean of its members' vectors. Centroids that lost every
    * member drop out (standard k-means behavior). Two shuffles on
    * (centroid_id, dim) / centroid_id — both tiny reductions. */
  def lloydStep(assigned: DataFrame, qvCol: String): DataFrame =
    assigned
      .select(col("centroid_id"), posexplode(col(qvCol)).as(Seq("pos", "v")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .withColumn("m", expr("s div n"))
      .groupBy(col("centroid_id"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)").as("cv"))

  /** Explodes each query row into its `nProbe` nearest centroids
    * (columns: query columns + `centroid_id`). Map-side, like
    * [[assign]]: sort the broadcast array by (dist, centroid_id) and
    * slice the prefix. */
  def probe(queries: DataFrame, qvCol: String, centroids: DataFrame,
      nProbe: Int): DataFrame =
    queries.crossJoin(broadcast(centroidArray(centroids)))
      .withColumn("centroid_id", explode(expr(
        s"""transform(
              slice(array_sort(transform(__cents, c ->
                struct(${sqDistExpr(qvCol, "c.cv")} AS dist,
                       c.centroid_id AS centroid_id))), 1, $nProbe),
              p -> p.centroid_id)""")))
      .drop("__cents")
}
