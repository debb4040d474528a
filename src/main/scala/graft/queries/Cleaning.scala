package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline's relational semantics (SURVEY.md §2.3–§2.7)
  * re-expressed over the test tables so the DuckDB oracle can replay
  * them: TRIM/NULLIF/COALESCE/TRY_CAST normalization (P1–P5), canonical
  * window dedup (W1), NULL-normalized grouped counts (G1) and the
  * rollup-family re-aggregation (G2, as native GROUPING SETS).
  *
  * The full medallion pipeline (bronze JSON → silver parquet → gold
  * exports) lives in graft.pipeline and is exercised by ScalaTest on
  * brewery-shaped fixtures; these queries pin the per-operator semantics
  * against the oracle.
  */
object Cleaning {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q50
    // P1–P5: cast / trim / nullif / coalesce / try_cast normalization.
    Q(
      "q50_clean_normalize",
      Some("""
        SELECT c_custkey,
               COALESCE(NULLIF(TRIM(c_name), ''), '(unknown)') AS name_clean,
               TRY_CAST(c_name AS DOUBLE) AS name_as_num,
               TRY_CAST(CAST(c_custkey AS VARCHAR) AS DOUBLE) AS key_roundtrip,
               NULLIF(TRIM(c_mktsegment), '') AS segment_clean
        FROM customer""")
    ) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        coalesce(nullif(trim(col("c_name")), lit("")), lit("(unknown)")).as("name_clean"),
        expr("try_cast(c_name AS DOUBLE)").as("name_as_num"),
        expr("try_cast(CAST(c_custkey AS STRING) AS DOUBLE)").as("key_roundtrip"),
        nullif(trim(col("c_mktsegment")), lit("")).as("segment_clean"))
    },

    // ---------------------------------------------------------------- q51
    // W1: dedup-by-key with a canonical survivor (row_number = 1 under a
    // total order — the deterministic version of the reference's
    // QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY id) = 1).
    Q(
      "q51_dedup_canonical",
      Some("""
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
          SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_linenumber, l_partkey,
                                             l_quantity, l_suppkey, l_extendedprice) AS rn
          FROM lineitem) t
        WHERE rn = 1""")
    ) { (s, dir) =>
      // (linenumber, partkey) is NOT unique per order in this data — the
      // survivor order must be total or the two engines pick different rows
      val w = Window.partitionBy("l_orderkey").orderBy(
        col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        col("l_suppkey"), col("l_extendedprice"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    },

    // ---------------------------------------------------------------- q52
    // G1: grouped count with NULL dims normalized to '' *before* grouping.
    Q(
      "q52_group_coalesce",
      Some("""
        SELECT COALESCE(o_orderstatus, '') AS status,
               COALESCE(o_orderpriority, '') AS priority,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2""")
    ) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(coalesce(col("o_orderstatus"), lit("")).as("status"),
          coalesce(col("o_orderpriority"), lit("")).as("priority"))
        .agg(count(lit(1)).as("n"))
    },

    // ---------------------------------------------------------------- q53
    // G2: the reference's three coarser-grain re-aggregations, expressed
    // as one native GROUPING SETS pass over the fine grain.
    Q(
      "q53_grouping_sets",
      Some("""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))""")
    ) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("graft_orders_gs")
      s.sql("""
        SELECT COALESCE(o_orderstatus, '(all)') AS status,
               COALESCE(o_orderpriority, '(all)') AS priority,
               COUNT(*) AS n
        FROM graft_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))""")
    },
  )
}
