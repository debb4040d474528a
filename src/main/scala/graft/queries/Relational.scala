package graft.queries

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.3–§2.8 semantics,
  * re-expressed over the TPC-H-ish test tables): scans, filters,
  * projections, joins (broadcast / shuffle / semi / anti), windows,
  * aggregations, rollups, set ops, sorts and top-k.
  *
  * Scale notes (100 TB thinking):
  *   - dimension tables (region/nation/part/supplier) are always
  *     broadcast; fact-fact joins shuffle on their join keys only after
  *     filters are pushed to the parquet scan;
  *   - aggregations are plain hash aggregates (partial + final) with no
  *     row explosion; windows partition by high-cardinality keys.
  */
object Relational {
  import Det._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q01
    // TPC-H Q1 shape: scan + filter + hash aggregate (partial/final).
    Q(
      "q01_pricing_summary",
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast(org.apache.spark.sql.types.DecimalType(18, 4)).cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // ---------------------------------------------------------------- q02
    // Pure filter + projection: predicates and column pruning must reach
    // the parquet scan (PushedFilters / ReadSchema).
    Q(
      "q02_filter_project",
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND l_quantity < 24""")
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00"))
          && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    },

    // ---------------------------------------------------------------- q03
    // TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    // Top-k is deterministic: revenue is decimal-exact, orderkey breaks ties.
    Q(
      "q03_top_orders",
      Some("""
        SELECT l_orderkey,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
               CAST(o_orderdate AS DATE) AS o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")
    ) { (s, dir) =>
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders")
          .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .filter(col("l_shipdate") > to_timestamp(lit("1995-03-15 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)).cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },

    // ---------------------------------------------------------------- q04
    // Broadcast join: part is a dimension -> broadcast, no shuffle of part.
    Q(
      "q04_broadcast_join",
      Some("""
        SELECT p_brand, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---------------------------------------------------------------- q05
    // TPC-H Q5 shape: five-way join; all dims broadcast, facts shuffle once.
    Q(
      "q05_regional_revenue",
      Some("""
        SELECT n_name,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
        GROUP BY n_name""")
    ) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)).cast("double").as("revenue"))
    },

    // ---------------------------------------------------------------- q06
    // TPC-H Q6 shape: scalar aggregate over a pushed-down range filter.
    Q(
      "q06_forecast_revenue",
      Some("""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00"))
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // ---------------------------------------------------------------- q07
    // Left-semi join (EXISTS): customers having at least one big order.
    Q(
      "q07_semi_join",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)""")
    ) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // ---------------------------------------------------------------- q08
    // Left-anti join (NOT EXISTS): customers with no orders at all.
    Q(
      "q08_anti_join",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 450000)""")
    ) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // ---------------------------------------------------------------- q09
    // Window rank + deterministic survivor: top order per customer
    // (SURVEY.md W1 semantics with a canonical total order).
    Q(
      "q09_window_topn",
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
        WHERE rn = 1""")
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    },

    // ---------------------------------------------------------------- q10
    // Running window aggregate with explicit ROWS frame.
    Q(
      "q10_window_running",
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders""")
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
    },

    // ---------------------------------------------------------------- q48
    // RANGE window frame: per-customer spend inside a sliding 30-day
    // event-time window (frame bounds in exact microseconds on both
    // engines).
    Q(
      "q48_range_frame",
      Some("""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 OVER (PARTITION BY o_custkey ORDER BY epoch_us(CAST(o_orderdate AS TIMESTAMP))
                       RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        FROM orders""")
    ) { (s, dir) =>
      // parquet ms timestamps read as TIMESTAMP_NTZ; cast to TIMESTAMP
      // (session tz is UTC) before unix_micros — same instants as
      // DuckDB's epoch_us
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_micros(col("o_orderdate").cast("timestamp")))
        .rangeBetween(-2592000000000L, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("spend_30d"))
    },

    // ---------------------------------------------------------------- q49
    // first_value / last_value / ntile over explicit frames.
    Q(
      "q49_first_last_ntile",
      Some("""
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
               NTILE(4) OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice, o_orderkey) AS price_quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")
    ) { (s, dir) =>
      val ordered = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val byPrice = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          first(col("o_orderkey")).over(ordered).as("first_order"),
          last(col("o_orderkey")).over(full).as("last_order"),
          ntile(4).over(byPrice).cast("long").as("price_quartile"))
    },

    // ---------------------------------------------------------------- q11
    // Distinct aggregate: per-nation customer stats.
    Q(
      "q11_distinct_agg",
      Some("""
        SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS n_segments,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        FROM customer GROUP BY c_nationkey""")
    ) { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
          count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("total_bal"))
    },

    // ---------------------------------------------------------------- q12
    // Global sort + limit (TakeOrdered at execution; no full sort shuffle).
    Q(
      "q12_topk_orders",
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""")
    ) { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    },

    // ---------------------------------------------------------------- q13
    // UNION ALL of heterogeneous sources mapped to a common schema.
    Q(
      "q13_union_all",
      Some("""
        SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
        UNION ALL
        SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier""")
    ) { (s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          lit("customer").as("src"))
        .unionAll(t(s, dir, "supplier")
          .select(col("s_suppkey").as("id"), col("s_name").as("name"),
            lit("supplier").as("src")))
    },

    // ---------------------------------------------------------------- q14
    // EXCEPT (set difference): nations with customers but no suppliers.
    Q(
      "q14_except",
      Some("""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier""")
    ) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
        .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct())
    },

    // ---------------------------------------------------------------- q41
    // INTERSECT (set intersection with distinct semantics).
    Q(
      "q41_intersect",
      Some("""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier""")
    ) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct())
    },

    // ---------------------------------------------------------------- q43
    // PIVOT: market segments to columns (explicit value list keeps the
    // output schema static — the scalable form; inferred pivots need an
    // extra distinct pass over the data).
    Q(
      "q43_pivot_segments",
      Some("""
        SELECT c_nationkey,
               CAST(COUNT(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS BIGINT) AS automobile,
               CAST(COUNT(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 END) AS BIGINT) AS building,
               CAST(COUNT(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 END) AS BIGINT) AS furniture,
               CAST(COUNT(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 END) AS BIGINT) AS household,
               CAST(COUNT(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 END) AS BIGINT) AS machinery
        FROM customer GROUP BY c_nationkey""")
    ) { (s, dir) =>
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val pivoted = t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment", segs)
        .count()
      // rename before lowercasing: drop()/withColumn are case-insensitive
      // by default, so adding "automobile" next to "AUTOMOBILE" collides
      val renamed = segs.foldLeft(pivoted)(
        (df, seg) => df.withColumnRenamed(seg, s"v_$seg"))
      renamed.select(col("c_nationkey") +:
        segs.map(seg => coalesce(col(s"v_$seg"), lit(0L)).as(seg.toLowerCase)): _*)
    },

    // ---------------------------------------------------------------- q57
    // Correlated scalar subquery — Catalyst decorrelates
    // (RewriteCorrelatedScalarSubquery) into an aggregate + join; the
    // SQL text is identical in both engines.
    Q(
      "q57_correlated_subquery",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE (SELECT MAX(o_totalprice) FROM orders
               WHERE o_custkey = c_custkey) > 400000""")
    ) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("graft_q57_customer")
      t(s, dir, "orders").createOrReplaceTempView("graft_q57_orders")
      s.sql("""
        SELECT c_custkey, c_name FROM graft_q57_customer
        WHERE (SELECT MAX(o_totalprice) FROM graft_q57_orders
               WHERE o_custkey = c_custkey) > 400000""")
    },

    // ---------------------------------------------------------------- q45
    // HLL sketch: approx_count_distinct at rsd=0.05. The raw estimate is
    // engine-specific by construction, so the oracle covers the exact
    // columns and the sketch is verified Spark-side as a boolean —
    // |approx − exact| ≤ 3·rsd·exact (documented HLL++ error bound) —
    // which the oracle pins to TRUE. Deterministic: HLL on the same data
    // always yields the same estimate, so the flag cannot flap.
    Q(
      "q45_approx_distinct",
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               COUNT(*) AS n,
               TRUE AS hll_within_3rsd
        FROM lineitem GROUP BY l_returnflag""")
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= col("exact_parts") * 0.15).as("hll_within_3rsd"))
    },

    // ---------------------------------------------------------------- q46
    // Salted skew join (graft.operators.SkewJoin): same result set as
    // the plain equi-join — salting only reshapes the shuffle — so the
    // unsalted SQL join is the oracle.
    Q(
      "q46_salted_join",
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus""")
    ) { (s, dir) =>
      val li = t(s, dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
      val o = t(s, dir, "orders").withColumnRenamed("o_orderkey", "orderkey")
      graft.operators.SkewJoin.saltedJoin(li, o, Seq("orderkey"), salts = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---------------------------------------------------------------- q44
    // Exact interpolated percentiles (median / p90). Both engines sort
    // and linearly interpolate over identical double inputs.
    Q(
      "q44_percentiles",
      Some("""
        SELECT o_orderstatus,
               quantile_cont(o_totalprice, 0.5) AS median_price,
               quantile_cont(o_totalprice, 0.9) AS p90_price,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus""")
    ) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(expr("percentile(o_totalprice, 0.5)").as("median_price"),
          expr("percentile(o_totalprice, 0.9)").as("p90_price"),
          count(lit(1)).as("n"))
    },

    // ---------------------------------------------------------------- q15
    // CASE bucketing + aggregate (conditional expressions stay in codegen).
    Q(
      "q15_case_bucket",
      Some("""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders GROUP BY 1""")
    ) { (s, dir) =>
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    },

    // ---------------------------------------------------------------- q16
    // Scalar string functions (SURVEY.md P2/P6 family).
    Q(
      "q16_string_funcs",
      Some("""
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               LENGTH(c_name) AS name_len,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               c_mktsegment || ':' || c_name AS tagged,
               REPLACE(c_name, '#', '-') AS name_clean
        FROM customer""")
    ) { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        length(col("c_name")).cast("long").as("name_len"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"),
        regexp_replace(col("c_name"), "#", "-").as("name_clean"))
    },

    // ---------------------------------------------------------------- q17
    // Date/time extraction functions (SURVEY.md P7 family).
    Q(
      "q17_date_funcs",
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2, 3""")
    ) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(count(lit(1)).as("n_orders"))
    },

    // ---------------------------------------------------------------- q18
    // ROLLUP hierarchy (SURVEY.md G2's family as a native rollup).
    Q(
      "q18_rollup",
      Some("""
        SELECT COALESCE(c_mktsegment, '') AS segment,
               COALESCE(c_nationkey, -1) AS nationkey,
               COUNT(*) AS n
        FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)""")
    ) { (s, dir) =>
      t(s, dir, "customer")
        .rollup(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("c_mktsegment"), lit("")).as("segment"),
          coalesce(col("c_nationkey"), lit(-1)).as("nationkey"),
          col("n"))
    },

    // ---------------------------------------------------------------- q19
    // HAVING (post-aggregation filter).
    Q(
      "q19_having",
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12""")
    ) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 12)
    },

    // ---------------------------------------------------------------- q20
    // Scalar subquery: orders above the (deterministic) global mean.
    Q(
      "q20_scalar_subquery",
      Some("""
        SELECT COUNT(*) AS n_above,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_above
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM orders)""")
    ) { (s, dir) =>
      val o = t(s, dir, "orders")
      val thr = o.agg(davg(col("o_totalprice")).as("thr"))
      o.join(broadcast(thr))
        .filter(col("o_totalprice") > col("thr"))
        .agg(count(lit(1)).as("n_above"), dsum(col("o_totalprice")).as("sum_above"))
    },

    // ---------------------------------------------------------------- q88
    // In-engine OLS: closed-form linear regression of price on
    // quantity per return flag, from SUFFICIENT STATISTICS — one
    // aggregation pass collecting exact-integer Σx, Σy, Σxy, Σx², Σy²
    // (x integral; y quantized to whole currency units), then the
    // normal-equation arithmetic runs on exact longs cast to double
    // with the IDENTICAL expression tree on both engines (every IEEE
    // op is exactly rounded, so same tree ⇒ same bits). This is how
    // regression scales: the data pass is a plain partial-aggregated
    // groupBy; the fit itself touches five numbers per group.
    Q(
      "q88_linear_fit",
      Some("""
        WITH q AS (
          SELECT l_returnflag,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(round(l_extendedprice) AS BIGINT) AS y
          FROM lineitem),
        s AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM q GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS slope,
               (CAST(sy AS DOUBLE) - (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)))
                 / CAST(n AS DOUBLE) AS intercept,
               (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))))
                 / (((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)) - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)) - (CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) AS r2
        FROM s""")
    ) { (s, dir) =>
      val stats = t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice")).cast("long").as("y"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
      val sxyD = col("sxy").cast("double"); val sxxD = col("sxx").cast("double")
      val syyD = col("syy").cast("double")
      // expression trees mirror the oracle SQL exactly — same IEEE ops
      // in the same order on the same exact-integer inputs
      val num = (nD * sxyD) - (sxD * syD)
      val den = (nD * sxxD) - (sxD * sxD)
      stats.select(col("l_returnflag"), col("n"),
        (num / den).as("slope"),
        ((syD - ((num / den) * sxD)) / nD).as("intercept"),
        ((num * num) / (den * ((nD * syyD) - (syD * syD)))).as("r2"))
    },

    // ---------------------------------------------------------------- q100
    // CUBE — all four grouping combinations of (status, priority) in
    // one pass, completing the rollup (q18) / GROUPING SETS (q53)
    // family. Subtotal NULLs disambiguate through sentinels exactly
    // like q18 (the data's own values are never NULL). One shuffle on
    // the grouping-id-expanded keys, partial-aggregated map-side.
    Q(
      "q100_cube",
      Some("""
        SELECT COALESCE(o_orderstatus, '?') AS status,
               COALESCE(o_orderpriority, '?') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")
    ) { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("?")).as("status"),
          coalesce(col("o_orderpriority"), lit("?")).as("priority"),
          col("n"), col("sum_price"))
    },

    // ---------------------------------------------------------------- q101
    // UNPIVOT (melt) — the inverse of q43's pivot: per-flag measure
    // columns unpivot into (measure, value) rows via stack(). The
    // corpus aggregates FIRST (one exchange); the unpivot itself is a
    // per-row generator over the tiny aggregate, which is how melt
    // should always be placed at scale (never explode the fact table
    // and aggregate after).
    Q(
      "q101_unpivot",
      Some("""
        WITH agg AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS price,
                 CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS disc
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, 'qty' AS measure, qty AS value FROM agg
        UNION ALL
        SELECT l_returnflag, 'price', price FROM agg
        UNION ALL
        SELECT l_returnflag, 'disc', disc FROM agg""")
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice")).as("price"),
          dsum(col("l_discount")).as("disc"))
        .selectExpr("l_returnflag",
          "stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (measure, value)")
    },

    // ---------------------------------------------------------------- q102
    // The remaining rank-function family in one window: rank,
    // dense_rank, percent_rank, cume_dist per order over
    // (status, price desc) with an orderkey tiebreak — total order, so
    // the two ratio functions are exact divisions of determined ranks
    // and bit-identical cross-engine.
    Q(
      "q102_rank_family",
      Some("""
        SELECT o_orderkey, o_orderstatus,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               PERCENT_RANK() OVER w AS prnk,
               CUME_DIST() OVER w AS cdist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)""")
    ) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
    },

    // ---------------------------------------------------------------- q108
    // FULL OUTER reconciliation — the join kind the library lacked:
    // two systems' per-entity aggregates (order counts by custkey,
    // event counts by user_id) full-outer-join on the shared id space;
    // unmatched sides null-fill and a presence tag classifies each
    // entity as both/orders-only/events-only. The standard
    // cross-system audit; both inputs pre-aggregate (shrink) BEFORE
    // the join, which is the order that scales.
    Q(
      "q108_full_outer",
      Some("""
        WITH o AS (
          SELECT o_custkey AS id, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey),
        e AS (
          SELECT user_id AS id, COUNT(*) AS n_events FROM events GROUP BY user_id)
        SELECT COALESCE(o.id, e.id) AS id,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(e.n_events, 0) AS n_events,
               CASE WHEN o.id IS NULL THEN 'events_only'
                    WHEN e.id IS NULL THEN 'orders_only'
                    ELSE 'both' END AS presence
        FROM o FULL OUTER JOIN e ON e.id = o.id""")
    ) { (s, dir) =>
      val o = t(s, dir, "orders").groupBy(col("o_custkey").as("id"))
        .agg(count(lit(1)).as("n_orders"))
      val e = t(s, dir, "events").groupBy(col("user_id").as("eid"))
        .agg(count(lit(1)).as("n_events"))
      o.join(e, col("id") === col("eid"), "full_outer")
        .select(coalesce(col("id"), col("eid")).as("id"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          when(col("id").isNull, "events_only")
            .when(col("eid").isNull, "orders_only")
            .otherwise("both").as("presence"))
    },

    // ---------------------------------------------------------------- q109
    // Multiset set operations — EXCEPT ALL / INTERSECT ALL keep
    // multiplicity where q14/q41's distinct forms collapse it: the
    // bag of shipping months (one per line item) minus the bag of
    // ordering months (one per order) answers "how much shipping
    // volume a month carries beyond its ordering volume" — a
    // bag-semantics reconciliation only the ALL variants express.
    // Spark plans these as aggregate+generate (no sort); per month
    // the identity |A∖B| + |A∩B| = |A| conserves.
    Q(
      "q109_multiset_setops",
      Some("""
        WITH ship AS (
          SELECT date_trunc('month', l_shipdate) AS m FROM lineitem),
        ordered AS (
          SELECT date_trunc('month', o_orderdate) AS m FROM orders),
        ex AS (SELECT m FROM ship EXCEPT ALL SELECT m FROM ordered),
        inter AS (SELECT m FROM ship INTERSECT ALL SELECT m FROM ordered)
        SELECT 'except_all' AS op, CAST(m AS DATE) AS month, COUNT(*) AS n
        FROM ex GROUP BY m
        UNION ALL
        SELECT 'intersect_all', CAST(m AS DATE), COUNT(*)
        FROM inter GROUP BY m""")
    ) { (s, dir) =>
      val ship = t(s, dir, "lineitem")
        .select(date_trunc("month", col("l_shipdate")).as("m"))
      val ordered = t(s, dir, "orders")
        .select(date_trunc("month", col("o_orderdate")).as("m"))
      val ex = ship.exceptAll(ordered)
        .groupBy(col("m")).agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("m").cast("date").as("month"), col("n"))
      val inter = ship.intersectAll(ordered)
        .groupBy(col("m")).agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("m").cast("date").as("month"), col("n"))
      ex.unionAll(inter)
    },

    // ---------------------------------------------------------------- q111
    // NOT IN — the null-aware anti join, semantically DISTINCT from
    // q08's NOT EXISTS: one NULL in the subquery poisons the whole
    // predicate to UNKNOWN and the result is EMPTY (three-valued
    // logic). Both branches are emitted: the clean subquery (parts
    // never shipped) and the NULL-poisoned one (must count 0 in both
    // engines — the parity that proves the semantics, not just the
    // plan). Spark plans the single-column case as a null-aware anti
    // join (broadcast, no per-row subquery).
    Q(
      "q111_not_in",
      Some("""
        SELECT 'not_in' AS op, COUNT(*) AS n
        FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)
        UNION ALL
        SELECT 'not_in_with_null', COUNT(*)
        FROM part WHERE p_partkey NOT IN
          (SELECT l_partkey FROM lineitem UNION ALL SELECT NULL)""")
    ) { (s, dir) =>
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      s.sql("""
        SELECT 'not_in' AS op, COUNT(*) AS n
        FROM g_part WHERE p_partkey NOT IN (SELECT l_partkey FROM g_lineitem)
        UNION ALL
        SELECT 'not_in_with_null', COUNT(*)
        FROM g_part WHERE p_partkey NOT IN
          (SELECT l_partkey FROM g_lineitem UNION ALL SELECT NULL)""")
    },

    // ---------------------------------------------------------------- q112
    // Order-free table checksum — the replication / migration
    // integrity check: each row canonicalizes to a '|'-joined string
    // (integers render identically in both engines; dates cast to the
    // same ISO text), md5 hashes it, the first 12 hex chars convert to
    // an integer through a GENERATED positional polynomial (no strtol
    // in DuckDB; instr('0123456789abcdef', c)−1 digit-decodes in both
    // engines), and the per-group checksum is the exact decimal sum
    // mod 2⁶². Addition is commutative, so the checksum is
    // partition-order-free and mergeable — two sides of a copy compare
    // one tiny row set instead of the data. One partial-aggregated
    // exchange.
    Q(
      "q112_table_checksum",
      Some {
        // DuckDB has no hex→int builtin, so the oracle decodes the 12
        // hex chars through a positional polynomial (its runtime is
        // not benched); the Spark side uses the codegen'd conv()
        val poly = (0 until 12).map { p =>
          s"(instr('0123456789abcdef', substr(h, ${12 - p}, 1)) - 1) * ${1L << (4 * p)}"
        }.mkString(" + ")
        s"""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST($poly AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT) AS checksum
        FROM (
          SELECT l_returnflag,
                 md5(concat_ws('|', l_orderkey, l_linenumber, l_returnflag,
                               CAST(l_shipdate AS VARCHAR))) AS h
          FROM lineitem) t
        GROUP BY l_returnflag"""
      }
    ) { (s, dir) =>
      // conv(hex, 16, 10) references the hash exactly once, so even
      // after projection collapse each row computes ONE md5 — the
      // written-out 12-term polynomial re-inlines into 12 md5s per
      // row (measured 3× slower), and the HOF fold is interpreted
      // (worse still)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("md5(concat_ws('|', l_orderkey, l_linenumber, l_returnflag, CAST(l_shipdate AS STRING)))")
            .as("h"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          expr("""CAST(SUM(CAST(conv(substring(h, 1, 12), 16, 10) AS DECIMAL(38,0)))
                    % 4611686018427387904 AS BIGINT)""")
            .as("checksum"))
    },

    // ---------------------------------------------------------------- q96
    // Histogram-sketch quantiles — the MERGEABLE alternative to q44's
    // exact percentile: prices hash-aggregate into fixed-width buckets
    // (width 100, map-side combinable, ONE corpus exchange, no global
    // sort), and a quantile estimate is the first bucket whose
    // cumulative count reaches ceil(q·n) — rank error ≤ the bucket
    // population, value error ≤ the bucket width, both reported as the
    // [est_lo, est_hi) bracket. The cumulative window and the quantile
    // probe run over the tiny histogram, never the corpus; this is the
    // shape that survives 100 TB where q44's per-group sort does not.
    // All arithmetic is integer (quantiles as permyriad, ceil via
    // (n·qp + 9999) div 10000), so the sketch is bit-identical in both
    // engines — a full-value oracle, not an error-bound flag.
    Q(
      "q96_hist_quantile",
      Some("""
        WITH hist AS (
          SELECT l_returnflag, CAST(floor(l_extendedprice / 100) AS BIGINT) AS b,
                 COUNT(*) AS c
          FROM lineitem GROUP BY 1, 2),
        wc AS (
          SELECT l_returnflag, b, c,
                 SUM(c) OVER (PARTITION BY l_returnflag ORDER BY b
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 SUM(c) OVER (PARTITION BY l_returnflag) AS n
          FROM hist),
        qp AS (SELECT unnest([5000, 9000, 9900]) AS qp)
        SELECT l_returnflag, qp,
               MIN(b) * 100 AS est_lo, (MIN(b) + 1) * 100 AS est_hi,
               CAST(MIN(n) AS BIGINT) AS n,
               CAST(MIN((n * qp + 9999) // 10000) AS BIGINT) AS target_rank
        FROM wc CROSS JOIN qp
        WHERE cum >= (n * qp + 9999) // 10000
        GROUP BY l_returnflag, qp""")
    ) { (s, dir) =>
      import s.implicits._
      val hist = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") / 100).cast("long").as("b"))
        .agg(count(lit(1)).as("c"))
      val byFlag = Window.partitionBy("l_returnflag")
      val cum = byFlag.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val qps = Seq(5000, 9000, 9900).toDF("qp")
      hist
        .withColumn("cum", sum(col("c")).over(cum))
        .withColumn("n", sum(col("c")).over(byFlag))
        .crossJoin(broadcast(qps))
        .filter(col("cum") >= expr("(n * qp + 9999) div 10000"))
        .groupBy(col("l_returnflag"), col("qp"))
        .agg((min(col("b")) * 100).as("est_lo"),
          ((min(col("b")) + 1) * 100).as("est_hi"),
          min(col("n")).as("n"),
          min(expr("(n * qp + 9999) div 10000")).as("target_rank"))
    },

    // --------------------------------------------------------------- q121
    // Two-phase distributed skyline (Pareto frontier): orders that no
    // other order beats on BOTH (higher o_totalprice, earlier
    // o_orderdate) — the classic multi-criteria shortlist operator.
    // The 2-D skyline is a sort + running-min: ordered by (price DESC,
    // date ASC, key ASC), a row survives iff its date strictly beats
    // the min date of every preceding row; equal (price, date)
    // duplicates collapse to the smallest o_orderkey (declared strict
    // semantics, identical in both engines). Scale shape: phase 1 runs
    // that window PER HASH BUCKET (32-way partitionBy — local skylines,
    // fully parallel, removes ~all rows since a random 2-D skyline is
    // O(log n) per bucket); phase 2 reruns the window on the tiny
    // survivor union. Local-dominated ⇒ globally dominated, and the
    // globally smallest-key duplicate survives its own bucket, so
    // two-phase == the oracle's single global window, while the only
    // single-partition step sees survivors, never the corpus.
    Q(
      "q121_skyline",
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM (
          SELECT o_orderkey, o_totalprice, o_orderdate,
                 min(o_orderdate) OVER (
                   ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
          FROM orders) t
        WHERE best_prev IS NULL OR o_orderdate < best_prev""")
    ) { (s, dir) =>
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
      def skyline(df: DataFrame, part: Seq[String]): DataFrame = {
        val base = if (part.isEmpty) Window.partitionBy()
        else Window.partitionBy(part.map(col): _*)
        val w = base
          .orderBy(desc("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, -1)
        df.withColumn("best_prev", min(col("o_orderdate")).over(w))
          .filter(col("best_prev").isNull || col("o_orderdate") < col("best_prev"))
          .drop("best_prev")
      }
      val local = skyline(o.withColumn("bucket", col("o_orderkey") % 32),
        Seq("bucket")).drop("bucket")
      skyline(local, Seq.empty)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    },

    // --------------------------------------------------------------- q131
    // Join-skew diagnostics: the report an ops run reads BEFORE a big
    // fact-fact join — per-key frequency distribution of lineitem's
    // join key (l_orderkey): total keys, max/p50/p99 key frequency,
    // the top key's share of all rows, and how many keys exceed 4× the
    // mean (the salting/AQE-skew-threshold candidates). One keyed
    // count (map-side combined) then ONE aggregate over the key-
    // frequency table — the corpus shuffles once and the diagnostic is
    // key-cardinality-sized. Percentiles on integer frequencies via
    // the proven percentile == quantile_cont match; skew candidates
    // use the exact cross-multiplied integer test (freq·n_keys >
    // 4·total), BANKED into DECIMAL(38,0) / HUGEINT — freq·n_keys
    // passes BIGINT once keys × top-frequency exceeds ~9e18, well
    // inside petascale corpora, so the comparison is done in exact
    // wide integers on both engines.
    Q(
      "q131_skew_report",
      Some("""
        WITH freq AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS f
          FROM lineitem GROUP BY l_orderkey),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(SUM(f) AS BIGINT) AS n_rows
          FROM freq)
        SELECT t.n_keys, t.n_rows,
               CAST(MAX(f) AS BIGINT) AS max_f,
               quantile_cont(f, 0.5) AS p50_f,
               quantile_cont(f, 0.99) AS p99_f,
               CAST(MAX(f) AS DOUBLE) / t.n_rows AS top_share,
               CAST(SUM(CASE WHEN CAST(f AS HUGEINT) * t.n_keys
                                  > 4 * CAST(t.n_rows AS HUGEINT)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_skew_keys
        FROM freq CROSS JOIN tot t
        GROUP BY t.n_keys, t.n_rows""")
    ) { (s, dir) =>
      val freq = t(s, dir, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("f"))
      val tot = freq.agg(count(lit(1)).as("n_keys"), sum(col("f")).as("n_rows"))
      freq.crossJoin(broadcast(tot))
        .groupBy("n_keys", "n_rows")
        .agg(
          max(col("f")).as("max_f"),
          expr("percentile(f, 0.5)").as("p50_f"),
          expr("percentile(f, 0.99)").as("p99_f"),
          (max(col("f")).cast("double") / col("n_rows")).as("top_share"),
          sum(when(col("f").cast("decimal(38,0)") * col("n_keys")
              > lit(4L) * col("n_rows").cast("decimal(38,0)"), 1L)
            .otherwise(0L)).as("n_skew_keys"))
        .select("n_keys", "n_rows", "max_f", "p50_f", "p99_f",
          "top_share", "n_skew_keys")
    },

    // --------------------------------------------------------------- q134
    // Benford first-digit audit of o_totalprice — the fraud/synthetic-
    // data forensic: observed first-significant-digit counts vs the
    // Benford expectation, with a per-digit deviation statistic. The
    // digit extracts integer-only (no log10/float): first char of the
    // BIGINT cast of a positive double (round() before the cast —
    // Spark truncates, DuckDB rounds, the documented divergence). The
    // Benford expected SHARE log10(1+1/d) is a compile-time Scala
    // constant folded into both query texts as the same per-million
    // literal, so no runtime libm call exists in either engine; the
    // deviation statistic quantizes the ppm difference div 1000
    // before squaring and BANKS the square into DECIMAL(38,0) /
    // HUGEINT (an all-mass-on-one-digit corpus pushes the square to
    // ~n²·10⁶, past BIGINT at n ≳ 3e6) — the quotient lands back in
    // BIGINT. One map-side pass into a 9-row aggregate.
    Q(
      "q134_benford_audit", {
        val expPpm = (1 to 9).map(d =>
          d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000).toInt)
        val sqlCase = expPpm.map { case (d, p) => s"WHEN $d THEN $p" }.mkString(" ")
        Some(s"""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(round(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
          FROM orders WHERE o_totalprice >= 1),
        cnt AS (
          SELECT d, CAST(COUNT(*) AS BIGINT) AS obs FROM digits GROUP BY d),
        tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cnt)
        SELECT c.d, c.obs,
               CAST(CASE c.d $sqlCase END AS BIGINT) AS exp_ppm,
               CAST(c.obs AS DOUBLE) / t.n AS obs_share,
               CAST((CAST((c.obs * 1000000 - t.n * (CASE c.d $sqlCase END))
                          // 1000 AS HUGEINT)
                 * ((c.obs * 1000000 - t.n * (CASE c.d $sqlCase END)) // 1000))
                 // ((t.n * (CASE c.d $sqlCase END)) // 1000) AS BIGINT) AS dev
        FROM cnt c CROSS JOIN tot t""")
      }
    ) { (s, dir) =>
      val expPpm = (1 to 9).map(d =>
        d -> math.round(math.log10(1.0 + 1.0 / d) * 1000000).toInt)
      val expCol = expPpm.foldLeft(lit(null).cast("long")) { case (acc, (d, p)) =>
        when(col("d") === d, lit(p.toLong)).otherwise(acc)
      }
      val cnt = t(s, dir, "orders")
        .filter(col("o_totalprice") >= 1)
        .select(substring(round(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .cast("long").as("d"))
        .groupBy("d").agg(count(lit(1)).as("obs"))
      val tot = cnt.agg(sum(col("obs")).as("n"))
      cnt.crossJoin(broadcast(tot))
        .withColumn("exp_ppm", expCol)
        .select(col("d"), col("obs"), col("exp_ppm"),
          (col("obs").cast("double") / col("n")).as("obs_share"),
          expr("(cast((obs * 1000000 - n * exp_ppm) div 1000" +
            " as decimal(38,0)) * " +
            "((obs * 1000000 - n * exp_ppm) div 1000)) div ((n * exp_ppm) div 1000)")
            .as("dev"))
    },

    // --------------------------------------------------------------- q137
    // Nested-type rollup: each order materializes its lineitems as an
    // ARRAY<STRUCT> (ordered by linenumber — the document/denormalized
    // data model), then all per-order metrics derive from HOFs over
    // the nested array — item count, quantity sum via aggregate(),
    // the heaviest item via array_max over (quantity, linenumber)
    // structs. This is the semi-structured shape a feature store or
    // document pipeline serves; the nested build is ONE groupBy
    // (collect_list + array_sort), every downstream metric is
    // shuffle-free array math. Struct comparison order (field by
    // field) is identical in both engines; quantities quantize to
    // BIGINT centi-units before nesting so array arithmetic stays
    // exact.
    Q(
      "q137_nested_rollup",
      Some("""
        WITH nested AS (
          SELECT l_orderkey,
                 list_sort(list((l_linenumber, CAST(round(l_quantity * 100) AS BIGINT)))) AS items
          FROM lineitem GROUP BY l_orderkey)
        SELECT l_orderkey,
               CAST(len(items) AS BIGINT) AS n_items,
               CAST(list_sum(list_transform(items, x -> x[2])) AS BIGINT) AS qty_centi,
               CAST(list_max(list_transform(items, x -> (x[2], x[1])))[2] AS BIGINT)
                 AS heaviest_line,
               CAST(list_max(list_transform(items, x -> (x[2], x[1])))[1] AS BIGINT)
                 AS heaviest_qty
        FROM nested
        WHERE len(items) >= 5""")
    ) { (s, dir) =>
      val nested = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          struct(col("l_linenumber").as("ln"),
            round(col("l_quantity") * 100).cast("long").as("q")).as("item"))
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(col("item"))).as("items"))
      nested
        .filter(size(col("items")) >= 5)
        .select(col("l_orderkey"),
          size(col("items")).cast("long").as("n_items"),
          expr("aggregate(items, 0L, (acc, x) -> acc + x.q)").as("qty_centi"),
          expr("array_max(transform(items, x -> struct(x.q as q, x.ln as ln))).ln")
            .cast("long").as("heaviest_line"),
          expr("array_max(transform(items, x -> struct(x.q as q, x.ln as ln))).q")
            .cast("long").as("heaviest_qty"))
    },

    // --------------------------------------------------------------- q138
    // Row-preserving argmax: the supplier with the highest account
    // balance per nation — Spark `max_by` over a composite
    // (balance, -suppkey) struct, so ties deterministically pick the
    // smallest suppkey (bare max_by is nondeterministic under ties —
    // the composite IS the contract). The oracle replays the same
    // semantics as max-then-min-tiebreak (DuckDB 1.0's arg_max cannot
    // take a struct ordering key). One map-side-combined aggregate,
    // dimension-sized output.
    Q(
      "q138_argmax_supplier",
      Some("""
        WITH b AS (
          SELECT s_nationkey, s_suppkey,
                 CAST(round(s_acctbal * 100) AS BIGINT) AS bal
          FROM supplier),
        m AS (SELECT s_nationkey, MAX(bal) AS top_bal_centi FROM b GROUP BY s_nationkey)
        SELECT m.s_nationkey, MIN(b.s_suppkey) AS top_suppkey, m.top_bal_centi
        FROM m JOIN b ON b.s_nationkey = m.s_nationkey AND b.bal = m.top_bal_centi
        GROUP BY m.s_nationkey, m.top_bal_centi""")
    ) { (s, dir) =>
      val bal = round(col("s_acctbal") * 100).cast("long")
      t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(
          max_by(col("s_suppkey"), struct(bal.as("b"), (-col("s_suppkey")).as("k")))
            .as("top_suppkey"),
          max(bal).as("top_bal_centi"))
    },

    // --------------------------------------------------------------- q155
    // Column-profiling report: per column of `documents`, row count,
    // null count, distinct count, and the modal value's share in
    // permille — the first-contact data-profile an ingestion pipeline
    // materializes before anything else touches a new source. The
    // Spark side unpivots with one `stack` projection (ONE scan of the
    // table, vs the oracle's UNION ALL re-scans — semantically equal),
    // so the corpus is read once and shuffles once in (column, value)
    // space with map-side combine; per-column rollups then run over
    // value-cardinality-sized data. The modal share needs no tiebreak
    // (max of counts is order-free). BIGINT→VARCHAR casts render
    // identically in both engines for the non-negative ids profiled
    // here; double columns are deliberately excluded (float formatting
    // is engine-specific — the one profiling gap, documented).
    Q(
      "q155_column_profile",
      Some("""
        WITH v AS (
          SELECT 'lang' AS col_name, lang AS val FROM documents
          UNION ALL SELECT 'source', source FROM documents
          UNION ALL SELECT 'doc_id', CAST(doc_id AS VARCHAR) FROM documents
          UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents),
        n AS (
          SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(val) AS BIGINT) AS n_nonnull
          FROM v GROUP BY col_name),
        g AS (
          SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS c
          FROM v WHERE val IS NOT NULL GROUP BY col_name, val),
        d AS (
          SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(MAX(c) AS BIGINT) AS top_c
          FROM g GROUP BY col_name)
        SELECT n.col_name, n.n_rows, n.n_rows - n.n_nonnull AS n_null,
               coalesce(d.n_distinct, 0) AS n_distinct,
               CAST(CASE WHEN n.n_nonnull = 0 THEN 0
                    ELSE (d.top_c * 1000) // n.n_nonnull END AS BIGINT)
                 AS top_share_permille
        FROM n LEFT JOIN d ON n.col_name = d.col_name""")
    ) { (s, dir) =>
      val v = t(s, dir, "documents").select(expr(
        """stack(4,
           'lang', lang,
           'source', source,
           'doc_id', CAST(doc_id AS STRING),
           'n_chars', CAST(n_chars AS STRING)) AS (col_name, val)"""))
      val n = v.groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"), count(col("val")).as("n_nonnull"))
      val d = v.filter(col("val").isNotNull)
        .groupBy("col_name", "val").agg(count(lit(1)).as("c"))
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_distinct"), max(col("c")).as("top_c"))
      n.join(d, Seq("col_name"), "left")
        .select(col("col_name"), col("n_rows"),
          (col("n_rows") - col("n_nonnull")).as("n_null"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          // explicit zero-guard: an all-null column must not reach the
          // division at all (DuckDB's // raises on divide-by-zero in
          // some versions; NULL-propagation is not a portable guard)
          when(col("n_nonnull") === 0, lit(0L))
            .otherwise(expr("(top_c * 1000) div n_nonnull"))
            .as("top_share_permille"))
    },

    // --------------------------------------------------------------- q182
    // Distribution-drift audit between corpus halves (doc_id parity —
    // the yesterday-vs-today proxy): per profiled column, both halves'
    // row/distinct counts, the deterministic modal value (max count,
    // ties to the SMALLEST value — the q138 composite-argmax rule) with
    // its share, and the L1 distance between the two value
    // distributions in permille-quantized form (shares quantize to
    // permille BEFORE the distance, so every term is a bounded exact
    // integer at any corpus size — the cross-multiplied exact form
    // overflows 2⁶³ once n² · 1000 does). This is the monitoring query
    // a recurring ingest runs before accepting a new batch: q155
    // profiles ONE snapshot, this compares TWO. One corpus stack scan;
    // everything after lives in (column, value) space; the drift join
    // is a value-space full outer.
    Q(
      "q182_profile_drift",
      Some("""
        WITH v AS (
          SELECT doc_id % 2 = 0 AS even, 'lang' AS col_name, lang AS val
          FROM documents
          UNION ALL
          SELECT doc_id % 2 = 0, 'source', source FROM documents
          UNION ALL
          SELECT doc_id % 2 = 0, 'len_bucket',
                 CAST(length(text) // 256 AS VARCHAR) FROM documents),
        g AS (
          SELECT col_name, even, val, CAST(COUNT(*) AS BIGINT) AS c
          FROM v GROUP BY 1, 2, 3),
        n AS (
          SELECT col_name, even, CAST(SUM(c) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct
          FROM g GROUP BY 1, 2),
        modal AS (
          SELECT col_name, even, MIN(val) AS modal_val, MAX(c) AS top_c
          FROM g
          JOIN (SELECT col_name AS cn2, even AS e2, MAX(c) AS mc
                FROM g GROUP BY 1, 2) m
            ON m.cn2 = g.col_name AND m.e2 = g.even AND g.c = m.mc
          GROUP BY col_name, even),
        shares AS (
          SELECT col_name, val,
                 CAST(1000 * SUM(CASE WHEN even THEN c ELSE 0 END)
                   AS BIGINT) AS ce,
                 CAST(1000 * SUM(CASE WHEN NOT even THEN c ELSE 0 END)
                   AS BIGINT) AS co
          FROM g GROUP BY 1, 2),
        sh2 AS (
          SELECT s.col_name,
                 s.ce // ne.n AS pm_even, s.co // no.n AS pm_odd
          FROM shares s
          JOIN (SELECT col_name, n FROM n WHERE even) ne USING (col_name)
          JOIN (SELECT col_name, n FROM n WHERE NOT even) no USING (col_name)),
        drift AS (
          SELECT col_name,
                 CAST(SUM(abs(pm_even - pm_odd)) AS BIGINT) AS l1_permille
          FROM sh2 GROUP BY col_name)
        SELECT ne.col_name,
               ne.n AS n_even, no.n AS n_odd,
               ne.n_distinct AS distinct_even, no.n_distinct AS distinct_odd,
               me.modal_val AS modal_even, mo.modal_val AS modal_odd,
               (1000 * me.top_c) // ne.n AS modal_share_even_pm,
               (1000 * mo.top_c) // no.n AS modal_share_odd_pm,
               d.l1_permille
        FROM (SELECT * FROM n WHERE even) ne
        JOIN (SELECT * FROM n WHERE NOT even) no USING (col_name)
        JOIN (SELECT * FROM modal WHERE even) me USING (col_name)
        JOIN (SELECT * FROM modal WHERE NOT even) mo USING (col_name)
        JOIN drift d USING (col_name)""")
    ) { (s, dir) =>
      val v = t(s, dir, "documents").select(
        (col("doc_id") % 2 === 0).as("even"),
        expr("""stack(3,
           'lang', lang,
           'source', source,
           'len_bucket', CAST(length(text) div 256 AS STRING))
           AS (col_name, val)"""))
      val g = v.groupBy("col_name", "even", "val")
        .agg(count(lit(1)).as("c"))
      val n = g.groupBy("col_name", "even")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
      val modal = g.groupBy("col_name", "even")
        .agg(max(col("c")).as("top_c"),
          expr("min_by(val, struct(-c, val))").as("modal_val"))
      val shares = g
        .groupBy("col_name", "val")
        .agg(sum(when(col("even"), col("c")).otherwise(0L)).as("c_even"),
          sum(when(!col("even"), col("c")).otherwise(0L)).as("c_odd"))
        .join(broadcast(n.filter(col("even"))
          .select(col("col_name"), col("n").as("n_even"))), "col_name")
        .join(broadcast(n.filter(!col("even"))
          .select(col("col_name"), col("n").as("n_odd"))), "col_name")
        .withColumn("pm_even", expr("(1000 * c_even) div n_even"))
        .withColumn("pm_odd", expr("(1000 * c_odd) div n_odd"))
      val drift = shares.groupBy("col_name")
        .agg(sum(abs(col("pm_even") - col("pm_odd"))).as("l1_permille"))
      def half(flag: Boolean, suffix: String) =
        n.filter(if (flag) col("even") else !col("even"))
          .join(modal.filter(if (flag) col("even") else !col("even")),
            Seq("col_name", "even"))
          .select(col("col_name"), col("n").as(s"n_$suffix"),
            col("n_distinct").as(s"distinct_$suffix"),
            col("modal_val").as(s"modal_$suffix"),
            expr("(1000 * top_c) div n").as(s"modal_share_${suffix}_pm"))
      half(flag = true, "even").join(half(flag = false, "odd"), "col_name")
        .join(drift, "col_name")
        .select(col("col_name"), col("n_even"), col("n_odd"),
          col("distinct_even"), col("distinct_odd"),
          col("modal_even"), col("modal_odd"),
          col("modal_share_even_pm"), col("modal_share_odd_pm"),
          col("l1_permille"))
    },

    // --------------------------------------------------------------- q156
    // Functional-dependency audit: for each DECLARED dependency
    // A → B, how many A-values map to more than one B — the
    // constraint-mining primitive behind schema inference and the
    // integrity check behind "is this column safe to use as a
    // canonical attribute". Three dependencies are audited in one
    // result: doc_id → source (a key, must hold), source → lang (a
    // plausible-but-false assumption this corpus refutes — each
    // source mixes languages), and c_custkey → c_nationkey (holds).
    // Each audit is one (lhs, rhs) distinct-collapse then an
    // lhs-grouped count — two map-side-combinable exchanges in
    // distinct-pair space, never a self-join; violation counts,
    // not just a boolean, so the report ranks HOW broken a
    // dependency is (max_rhs_per_lhs is the worst fan-out).
    Q(
      "q156_fd_audit",
      Some("""
        WITH fd1 AS (
          SELECT doc_id AS lhs, source AS rhs FROM documents GROUP BY 1, 2),
        fd2 AS (
          SELECT source AS lhs, lang AS rhs FROM documents GROUP BY 1, 2),
        fd3 AS (
          SELECT CAST(c_custkey AS VARCHAR) AS lhs,
                 CAST(c_nationkey AS VARCHAR) AS rhs
          FROM customer GROUP BY 1, 2),
        a1 AS (SELECT CAST(lhs AS VARCHAR) AS lhs, CAST(COUNT(*) AS BIGINT) AS nr
               FROM fd1 GROUP BY 1),
        a2 AS (SELECT lhs, CAST(COUNT(*) AS BIGINT) AS nr FROM fd2 GROUP BY 1),
        a3 AS (SELECT lhs, CAST(COUNT(*) AS BIGINT) AS nr FROM fd3 GROUP BY 1)
        SELECT 'doc_id->source' AS fd, CAST(COUNT(*) AS BIGINT) AS n_lhs,
               CAST(COUNT(*) FILTER (nr > 1) AS BIGINT) AS n_violating_lhs,
               CAST(MAX(nr) AS BIGINT) AS max_rhs_per_lhs
        FROM a1
        UNION ALL
        SELECT 'source->lang', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (nr > 1) AS BIGINT), CAST(MAX(nr) AS BIGINT)
        FROM a2
        UNION ALL
        SELECT 'c_custkey->c_nationkey', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (nr > 1) AS BIGINT), CAST(MAX(nr) AS BIGINT)
        FROM a3""")
    ) { (s, dir) =>
      def audit(pairs: DataFrame, name: String): DataFrame =
        pairs.distinct()
          .groupBy("lhs").agg(count(lit(1)).as("nr"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("nr") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
            max(col("nr")).as("max_rhs_per_lhs"))
          .select(lit(name).as("fd"), col("n_lhs"),
            col("n_violating_lhs"), col("max_rhs_per_lhs"))
      val docs = t(s, dir, "documents")
      val cust = t(s, dir, "customer")
      audit(docs.select(col("doc_id").cast("string").as("lhs"),
          col("source").as("rhs")), "doc_id->source")
        .unionAll(audit(docs.select(col("source").as("lhs"),
          col("lang").as("rhs")), "source->lang"))
        .unionAll(audit(cust.select(col("c_custkey").cast("string").as("lhs"),
          col("c_nationkey").cast("string").as("rhs")),
          "c_custkey->c_nationkey"))
    },

    // --------------------------------------------------------------- q186
    // Per-segment OLS trend fit of monthly revenue — "is this market
    // segment growing?" as a grouped regression from sufficient
    // statistics (q88's move, made per-group): revenue quantizes to
    // exact cents through DECIMAL(18,4) (the Det.dec image, so both
    // engines see the identical BIGINT), months index from the fixed
    // epoch 1995-01, and slope/intercept come from the closed-form
    //   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    // in floored integer cents-per-month. Two map-side-combinable
    // aggregations (orders → month cells → per-segment stats) and one
    // equi-join orders⋈customer on the fact key; nothing is collected
    // and no window touches the fact table. Scale: the month-cell
    // table is |segments|×|months| (tiny forever); the slope /
    // intercept cross-products (months²·total_cents — approaching
    // BIGINT at petascale cent volumes) are BANKED into
    // DECIMAL(38,0) / HUGEINT, so the closed form is exact at any
    // corpus size (sxy's per-cell terms stay ≤ months·total_cents,
    // inside BIGINT past 10¹⁰ orders).
    Q(
      "q186_segment_trend",
      Some("""
        WITH m AS (
          SELECT c.c_mktsegment AS segment,
                 CAST((year(CAST(o.o_orderdate AS TIMESTAMP)) - 1995) * 12
                      + month(CAST(o.o_orderdate AS TIMESTAMP)) - 1 AS BIGINT)
                   AS x,
                 CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,4)) * 100
                   AS BIGINT)) AS BIGINT) AS y,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1, 2),
        st AS (
          SELECT segment,
                 CAST(COUNT(*) AS BIGINT) AS n_months,
                 CAST(SUM(n_orders) AS BIGINT) AS n_orders,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM m GROUP BY 1),
        fit AS (
          SELECT segment, n_months, n_orders, sy,
                 CAST((CAST(n_months AS HUGEINT) * sxy
                       - CAST(sx AS HUGEINT) * sy)
                   // (CAST(n_months AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS slope_cents,
                 sx
          FROM st)
        SELECT segment, n_months, n_orders,
               sy // n_months AS mean_monthly_cents,
               slope_cents,
               CAST((CAST(sy AS HUGEINT) - CAST(slope_cents AS HUGEINT) * sx)
                 // n_months AS BIGINT) AS intercept_cents
        FROM fit""")
    ) { (s, dir) =>
      val cents = (col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 100)
        .cast("long")
      val m = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          ((year(col("o_orderdate")) - 1995) * 12
            + month(col("o_orderdate")) - 1).cast("long").as("x"))
        .agg(sum(cents).as("y"), count(lit(1)).as("n_orders"))
      m.groupBy("segment")
        .agg(count(lit(1)).as("n_months"),
          sum(col("n_orders")).as("n_orders"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_cents",
          expr("(cast(n_months as decimal(38,0)) * sxy" +
            " - cast(sx as decimal(38,0)) * sy)" +
            " div (cast(n_months as decimal(38,0)) * sxx" +
            " - cast(sx as decimal(38,0)) * sx)"))
        .select(col("segment"), col("n_months"), col("n_orders"),
          expr("sy div n_months").as("mean_monthly_cents"),
          col("slope_cents"),
          expr("(cast(sy as decimal(38,0))" +
            " - cast(slope_cents as decimal(38,0)) * sx)" +
            " div n_months").as("intercept_cents"))
    },

    // --------------------------------------------------------------- q204
    // Relational DIVISION — "customers with an order in EVERY quarter
    // of 1995" — the classical operator the basic algebra can't
    // express without double negation, in its scalable counting form:
    // |distinct quarters the customer ordered in| = |divisor|. The
    // divisor is the DECLARED literal set {1,2,3,4} (a division's
    // divisor is part of the question), the dividend is one distinct
    // pass over the year's orders, and the NOT EXISTS(EXCEPT)
    // textbook form becomes one keyed distinct + one groupBy +
    // HAVING — nothing correlated, nothing quadratic. Measured
    // selectivity 3/16/144 qualifying customers at the three SFs —
    // the mid-selectivity a division needs (part-set and
    // region-coverage variants measured degenerate 0% / 100% on this
    // uniform fixture; the operator shape is identical).
    Q(
      "q204_relational_division",
      Some("""
        WITH uq AS (
          SELECT DISTINCT o_custkey,
                 CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS q
          FROM orders
          WHERE year(CAST(o_orderdate AS DATE)) = 1995),
        per AS (
          SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_matched
          FROM uq GROUP BY 1)
        SELECT c.c_custkey, c.c_name, p.n_matched
        FROM per p
        JOIN customer c ON c.c_custkey = p.o_custkey
        WHERE p.n_matched = 4""")
    ) { (s, dir) =>
      val uq = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey"),
          quarter(col("o_orderdate")).cast("long").as("q"))
        .distinct()
      uq.groupBy("o_custkey").agg(count(lit(1)).as("n_matched"))
        .filter(col("n_matched") === 4)
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_matched"))
    },

    // --------------------------------------------------------------- q206
    // Floor-clamped running balance — the inventory recurrence
    // b_i = max(0, b_{i−1} + δ_i) looks inherently sequential, but it
    // has a CLOSED FORM over plain prefix aggregates:
    //   b_i = s_i − min(0, min_{j≤i} s_j)
    // (s = unclamped prefix sum), so the "loop" distributes as two
    // windows sharing one part-keyed partitioning — the q177 move for
    // a clamped sum. Semantics: per part (slice l_partkey < 200 keeps
    // the audit output bounded; the operator is identical unsliced),
    // returns ('R') restock +qty, other rows consume −qty, ordered by
    // (shipdate, orderkey, linenumber) — a synthetic inventory
    // declared as such; lost_demand = b − s ≥ 0 is the cumulative
    // unfilled quantity the clamp absorbed. All exact integers.
    // Scale: windows partition by part (thousands of independent
    // partitions), no global sort, no corpus-wide single partition.
    Q(
      "q206_clamped_balance",
      Some("""
        WITH d AS (
          SELECT l_partkey, l_orderkey, l_linenumber,
                 epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS ship_us,
                 CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS BIGINT)
                      ELSE -CAST(l_quantity AS BIGINT) END AS delta
          FROM lineitem WHERE l_partkey < 200),
        cum1 AS (
          SELECT l_partkey, l_orderkey, l_linenumber, ship_us, delta,
                 CAST(SUM(delta) OVER (PARTITION BY l_partkey
                   ORDER BY ship_us, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
          FROM d),
        cum AS (
          SELECT l_partkey, l_orderkey, l_linenumber, delta, s,
                 CAST(MIN(s) OVER (PARTITION BY l_partkey
                   ORDER BY ship_us, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS smin
          FROM cum1)
        SELECT l_partkey, l_orderkey, l_linenumber, delta, s,
               s - CASE WHEN smin < 0 THEN smin ELSE 0 END AS balance,
               (s - CASE WHEN smin < 0 THEN smin ELSE 0 END) - s
                 AS lost_demand
        FROM cum""")
    ) { (s, dir) =>
      val d = t(s, dir, "lineitem").filter(col("l_partkey") < 200)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
          when(col("l_returnflag") === "R", col("l_quantity").cast("long"))
            .otherwise(-col("l_quantity").cast("long")).as("delta"))
      val w = Window.partitionBy("l_partkey")
        .orderBy("ship_us", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = d
        .withColumn("s", sum(col("delta")).over(w))
        .withColumn("smin", min(col("s")).over(w))
      cum.select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("delta"), col("s"),
        (col("s") - when(col("smin") < 0, col("smin")).otherwise(0L))
          .as("balance"),
        ((col("s") - when(col("smin") < 0, col("smin")).otherwise(0L))
          - col("s")).as("lost_demand"))
    },

    // --------------------------------------------------------------- q212
    // Business-day order-to-ship lag — calendar arithmetic the
    // warehouse SLA report needs, in pure integers: W(x) = weekdays in epoch
    // days [0, x) has the closed form 5·⌊x/7⌋ + LUT[x mod 7] (epoch
    // day 0 is a Thursday, so the partial week walks Thu..Wed and the
    // LUT is the prefix count {0,1,2,2,2,3,4}); the ship→receipt lag
    // is W(ship) − W(order) — no calendar table, no UDF, identical
    // dense-array lookup in both engines (element_at on a literal —
    // the q191 integer-table move). Aggregated per ship month: mean
    // lag in exact permille, max, n. One map-side-combinable corpus
    // pass; the LUT is a 7-element literal, never a join.
    Q(
      "q212_business_day_lag",
      Some("""
        WITH d AS (
          SELECT year(CAST(l.l_shipdate AS DATE)) * 100
                 + month(CAST(l.l_shipdate AS DATE)) AS ship_month,
                 epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) // 86400000000 AS a,
                 epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) // 86400000000 AS b
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        w AS (
          SELECT ship_month,
                 (5 * (b // 7) + [0,1,2,2,2,3,4][CAST(b % 7 + 1 AS INT)])
                 - (5 * (a // 7) + [0,1,2,2,2,3,4][CAST(a % 7 + 1 AS INT)])
                   AS bd
          FROM d)
        SELECT CAST(ship_month AS BIGINT) AS ship_month,
               CAST(COUNT(*) AS BIGINT) AS n,
               (1000 * CAST(SUM(bd) AS BIGINT)) // COUNT(*) AS mean_bd_pm,
               CAST(MAX(bd) AS BIGINT) AS max_bd
        FROM w GROUP BY 1""")
    ) { (s, dir) =>
      def wdays(c: String): org.apache.spark.sql.Column =
        expr(s"5 * ($c div 7) + element_at(array(0,1,2,2,2,3,4), " +
          s"cast($c % 7 + 1 as int))")
      val d = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .select(
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("ship_month"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("a"),
          expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
            .as("b"))
      d.withColumn("bd", wdays("b") - wdays("a"))
        .groupBy("ship_month")
        .agg(count(lit(1)).as("n"),
          expr("(1000 * sum(bd)) div count(1)").as("mean_bd_pm"),
          max(col("bd")).as("max_bd"))
    },

    // --------------------------------------------------------------- q216
    // Nelson–Aalen cumulative hazard of order fulfilment — survival
    // analysis with right-censoring, the time-to-event report an SLA
    // dashboard wants when "mean days to ship" lies (open orders
    // would silently drop out). Subjects = orders; duration = days
    // from order to FIRST ship; status 'F' with a ship date is the
    // event, everything else is censored at the fixture horizon (max
    // ship date). H(t) = Σ_{s≤t} d_s/n_s quantized per-term to exact
    // ppm ((10⁶·d_s) div n_s, then an integer cumsum — the quantize-
    // then-sum contract, bit-identical cross-engine). The corpus cost
    // is one orders⋈lineitem min-ship aggregation; the risk-set
    // window runs in duration-value space (≤ a few hundred distinct
    // days, never corpus-sized), so the plan is one shuffle on
    // o_orderkey plus a value-space sort — scales.
    Q(
      "q216_nelson_aalen",
      Some("""
        WITH fs AS (
          SELECT l_orderkey,
                 MIN(epoch_us(CAST(l_shipdate AS TIMESTAMP))
                     // 86400000000) AS ship_day
          FROM lineitem GROUP BY 1),
        hz AS (
          SELECT MAX(ship_day) AS h FROM fs),
        subj AS (
          SELECT CASE WHEN o.o_orderstatus = 'F' AND fs.ship_day IS NOT NULL
                      THEN fs.ship_day ELSE hz.h END
                 - (epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                    // 86400000000) AS dur,
                 CASE WHEN o.o_orderstatus = 'F' AND fs.ship_day IS NOT NULL
                      THEN 1 ELSE 0 END AS ev
          FROM orders o
          LEFT JOIN fs ON fs.l_orderkey = o.o_orderkey
          CROSS JOIN hz),
        grid AS (
          SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_at,
                 CAST(SUM(ev) AS BIGINT) AS d_at
          FROM subj GROUP BY 1),
        risk AS (
          SELECT dur, d_at,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM subj)
                 - (CAST(SUM(n_at) OVER (ORDER BY dur) AS BIGINT) - n_at)
                   AS n_risk
          FROM grid)
        SELECT CAST(dur AS BIGINT) AS t_days, d_at AS d, n_risk,
               CAST(SUM((1000000 * d_at) // n_risk)
                    OVER (ORDER BY dur) AS BIGINT) AS hazard_ppm
        FROM risk WHERE d_at > 0""")
    ) { (s, dir) =>
      val fs = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(expr("min(unix_micros(cast(l_shipdate as timestamp))" +
          " div 86400000000)").as("ship_day"))
      val hz = fs.agg(max(col("ship_day")).as("h"))
      val subj = t(s, dir, "orders")
        .join(fs, col("l_orderkey") === col("o_orderkey"), "left")
        .crossJoin(broadcast(hz))
        .select(
          (when(col("o_orderstatus") === "F" && col("ship_day").isNotNull,
            col("ship_day")).otherwise(col("h"))
            - expr("unix_micros(cast(o_orderdate as timestamp))" +
              " div 86400000000")).as("dur"),
          when(col("o_orderstatus") === "F" && col("ship_day").isNotNull, 1L)
            .otherwise(0L).as("ev"))
      val grid = subj.groupBy("dur")
        .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d_at"))
      val total = subj.agg(count(lit(1)).as("n_total"))
      val risk = grid.crossJoin(broadcast(total))
        .select(col("dur"), col("d_at"),
          (col("n_total")
            - (sum(col("n_at")).over(Window.orderBy("dur")) - col("n_at")))
            .as("n_risk"))
      risk.select(col("dur").as("t_days"), col("d_at").as("d"), col("n_risk"),
          sum(expr("(1000000 * d_at) div n_risk"))
            .over(Window.orderBy("dur")).as("hazard_ppm"),
          col("d_at"))
        .filter(col("d_at") > 0)
        .select(col("t_days"), col("d"), col("n_risk"), col("hazard_ppm"))
    },

    // --------------------------------------------------------------- q217
    // Spearman rank correlation, balance vs spend, per nation — the
    // monotone-association audit (Pearson chases outliers; ranks
    // don't). Both variables rank by row_number over a TOTAL order
    // (value, then custkey — the documented deterministic-tiebreak
    // variant; c_acctbal is continuous so true ties are measure-zero,
    // and the tiebreak keeps the result reproducible if they occur).
    // ρ = 1 − 6·Σd²/(n(n²−1)) in exact floored ppm. Customers without
    // orders stay in at spend 0 (dropping them would bias the rank
    // domain). Corpus cost: one orders groupBy + one broadcast-sized
    // join; both rank windows partition by nation, so the sort is
    // per-group and the stat scales with the widest nation, not the
    // table. Σd² and the ppm quotient are BANKED: a single d² is ≤ n²
    // (past BIGINT at n > 3e9/nation), Σd² ≤ n³/3 and the ppm
    // numerator 6·10⁶·Σd² wrapped BIGINT at n ≳ 1.6e4/nation — the
    // d² terms cast to DECIMAL(38,0) before summing (Spark `div` on
    // decimals is the exact BigDecimal integral quotient) and the
    // oracle banks the same terms through HUGEINT, so the rank
    // algebra is exact to ~10¹⁰ rows per nation.
    Q(
      "q217_spearman",
      Some("""
        WITH sp AS (
          SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))
                                      * 100) AS BIGINT) AS cents
          FROM orders GROUP BY 1),
        cx AS (
          SELECT c.c_nationkey AS nation, c.c_custkey,
                 c.c_acctbal, COALESCE(sp.cents, 0) AS cents
          FROM customer c LEFT JOIN sp ON sp.o_custkey = c.c_custkey),
        rk AS (
          SELECT nation,
                 ROW_NUMBER() OVER (PARTITION BY nation
                   ORDER BY c_acctbal, c_custkey) AS rx,
                 ROW_NUMBER() OVER (PARTITION BY nation
                   ORDER BY cents, c_custkey) AS ry
          FROM cx)
        SELECT CAST(nation AS BIGINT) AS nation,
               CAST(COUNT(*) AS BIGINT) AS n,
               1000000 - CAST(
                 (6000000 * SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)))
                 // (CAST(COUNT(*) AS HUGEINT) * COUNT(*) * COUNT(*)
                    - COUNT(*)) AS BIGINT) AS rho_ppm
        FROM rk GROUP BY 1""")
    ) { (s, dir) =>
      val sp = t(s, dir, "orders").groupBy("o_custkey")
        .agg(expr("cast(sum(cast(o_totalprice as decimal(18,4)) * 100)" +
          " as bigint)").as("cents"))
      val cx = t(s, dir, "customer")
        .join(sp, col("o_custkey") === col("c_custkey"), "left")
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_custkey"), col("c_acctbal"),
          coalesce(col("cents"), lit(0L)).as("cents"))
      val rk = cx.select(col("nation"),
        row_number().over(Window.partitionBy("nation")
          .orderBy(col("c_acctbal"), col("c_custkey"))).as("rx"),
        row_number().over(Window.partitionBy("nation")
          .orderBy(col("cents"), col("c_custkey"))).as("ry"))
      // Σd² stays an INTERNAL decimal (a DECIMAL output column would
      // force a decimal/hugeint schema split across engines); the
      // report carries n and the banked ppm statistic.
      rk.groupBy("nation")
        .agg(count(lit(1)).as("n"),
          sum(((col("rx") - col("ry")).cast("decimal(38,0)")
            * (col("rx") - col("ry")))).as("sum_d2"))
        .select(col("nation"), col("n"),
          (lit(1000000L) - expr("(6000000 * sum_d2)" +
            " div (cast(n as decimal(38,0)) * n * n - n)")).as("rho_ppm"))
    },

    // --------------------------------------------------------------- q221
    // Gini-impurity feature ranking — the decision-tree split audit a
    // feature-engineering pass runs: which candidate feature best
    // predicts the return flag? Gini impurity (1 − Σp²) instead of
    // entropy BECAUSE it is rational: every score is exact integer
    // arithmetic in ppm, no log, bit-identical cross-engine.
    // Per feature f: gain = base − Σ_v (n_v/n)·G_v computed as
    // base_ppm − (Σ_v n_v·G_v_ppm) div n with G_v_ppm = 10⁶·(n_v² −
    // Σ_c n_vc²) div n_v² — one quantization per class-vector, then
    // exact sums. Features unpivot through one stack() pass so the
    // corpus is read ONCE for all four candidates; everything after
    // the (feature, value, class) groupBy is cell-space (Σ|domains|·
    // |classes| rows). The n² terms (class-count squares, per-value
    // squares, corpus square) are BANKED into DECIMAL(38,0) /
    // HUGEINT — exact past 10¹⁰ rows; the only residual BIGINT sum
    // is wsum = Σ n_v·G_ppm ≤ 10⁶·n, safe to n ≲ 9e12.
    Q(
      "q221_gini_impurity",
      Some("""
        WITH b AS (
          SELECT l_returnflag AS cls,
                 CAST(CAST(l_quantity AS BIGINT) // 10 AS VARCHAR) AS f_qty,
                 CAST(CAST(round(l_discount * 100) AS BIGINT) AS VARCHAR)
                   AS f_disc,
                 l_linestatus AS f_status,
                 CAST(month(CAST(l_shipdate AS DATE)) AS VARCHAR) AS f_month
          FROM lineitem),
        u AS (
          SELECT cls, 'qty_band' AS feature, f_qty AS val FROM b
          UNION ALL SELECT cls, 'disc_pct', f_disc FROM b
          UNION ALL SELECT cls, 'linestatus', f_status FROM b
          UNION ALL SELECT cls, 'ship_month', f_month FROM b),
        vc AS (
          SELECT feature, val, cls, CAST(COUNT(*) AS BIGINT) AS c
          FROM u GROUP BY 1, 2, 3),
        v AS (
          SELECT feature, val, CAST(SUM(c) AS BIGINT) AS n_v,
                 SUM(CAST(c AS HUGEINT) * c) AS s2
          FROM vc GROUP BY 1, 2),
        fw AS (
          SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_values,
                 CAST(SUM(n_v) AS BIGINT) AS n,
                 CAST(SUM(n_v * CAST((1000000 *
                        (CAST(n_v AS HUGEINT) * n_v - s2))
                      // (CAST(n_v AS HUGEINT) * n_v) AS BIGINT))
                   AS BIGINT) AS wsum
          FROM v GROUP BY 1),
        cm AS (
          SELECT cls, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
        base AS (
          SELECT CAST(SUM(c) AS HUGEINT) * CAST(SUM(c) AS BIGINT) AS nn,
                 SUM(CAST(c AS HUGEINT) * c) AS s2
          FROM cm)
        SELECT fw.feature, fw.n_values,
               CAST((1000000 * (base.nn - base.s2)) // base.nn AS BIGINT)
                 AS base_ppm,
               fw.wsum // fw.n AS weighted_ppm,
               CAST((1000000 * (base.nn - base.s2)) // base.nn AS BIGINT)
                 - fw.wsum // fw.n AS gain_ppm
        FROM fw CROSS JOIN base""")
    ) { (s, dir) =>
      val b = t(s, dir, "lineitem").select(
        col("l_returnflag").as("cls"),
        expr("cast(cast(l_quantity as bigint) div 10 as string)")
          .as("f_qty"),
        expr("cast(cast(round(l_discount * 100) as bigint) as string)")
          .as("f_disc"),
        col("l_linestatus").as("f_status"),
        month(col("l_shipdate")).cast("string").as("f_month"))
      val u = b.select(col("cls"), expr(
        """stack(4,
           'qty_band', f_qty,
           'disc_pct', f_disc,
           'linestatus', f_status,
           'ship_month', f_month) AS (feature, val)"""))
      val vc = u.groupBy("feature", "val", "cls")
        .agg(count(lit(1)).as("c"))
      val v = vc.groupBy("feature", "val")
        .agg(sum(col("c")).as("n_v"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
      val fw = v.groupBy("feature")
        .agg(count(lit(1)).as("n_values"), sum(col("n_v")).as("n"),
          sum(col("n_v")
            * expr("(1000000 * (cast(n_v as decimal(38,0)) * n_v - s2))" +
              " div (cast(n_v as decimal(38,0)) * n_v)")).as("wsum"))
      val base = b.groupBy("cls").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("nb"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
        .select((col("nb").cast("decimal(38,0)") * col("nb")).as("nn"),
          col("s2"))
      fw.crossJoin(broadcast(base))
        .select(col("feature"), col("n_values"),
          expr("(1000000 * (nn - s2)) div nn").as("base_ppm"),
          expr("wsum div n").as("weighted_ppm"),
          expr("(1000000 * (nn - s2)) div nn - wsum div n").as("gain_ppm"))
    },

    // --------------------------------------------------------------- q226
    // FIFO lot allocation — the inventory-costing match every
    // warehouse ledger runs: per part, filled line items ('F') are
    // supply lots in ship-date order, open ones ('O') are demands in
    // the same order, and FIFO consumption is computed WITHOUT a
    // serial loop via the cumulative-interval trick: a lot covers
    // cumulative-quantity range [s_hi−q, s_hi), a demand covers
    // [d_hi−q, d_hi), and the allocation of lot→demand is the length
    // of their overlap — a per-part range join whose match count is
    // LINEAR (≤ supplies + demands − 1 chained intervals per part,
    // never quadratic). Quantities are exact BIGINTs; both cumsum
    // windows partition by part with a unique (date, orderkey,
    // linenumber) order. Output: per-part totals — lots, demands,
    // allocated, unfilled demand, leftover supply — so the report is
    // part-space. The join is an equi-join on partkey with range
    // residuals: SMJ-able, no broadcast of corpus-sized sides, per-
    // part windows only — scales with the busiest part.
    Q(
      "q226_fifo_allocation",
      Some("""
        WITH sup AS (
          SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT) AS hi
          FROM lineitem WHERE l_linestatus = 'F'
          WINDOW w AS (PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber)),
        dem AS (
          SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT) AS hi
          FROM lineitem WHERE l_linestatus = 'O'
          WINDOW w AS (PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber)),
        al AS (
          SELECT s.pk,
                 least(s.hi, d.hi) - greatest(s.hi - s.q, d.hi - d.q)
                   AS alloc
          FROM sup s JOIN dem d ON d.pk = s.pk
            AND s.hi - s.q < d.hi AND d.hi - d.q < s.hi),
        sa AS (
          SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_lots,
                 CAST(SUM(q) AS BIGINT) AS supply FROM sup GROUP BY 1),
        da AS (
          SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_demands,
                 CAST(SUM(q) AS BIGINT) AS demand FROM dem GROUP BY 1),
        aa AS (
          SELECT pk, CAST(SUM(alloc) AS BIGINT) AS allocated
          FROM al GROUP BY 1)
        SELECT sa.pk AS partkey, sa.n_lots,
               COALESCE(da.n_demands, 0) AS n_demands,
               sa.supply, COALESCE(da.demand, 0) AS demand,
               COALESCE(aa.allocated, 0) AS allocated,
               COALESCE(da.demand, 0) - COALESCE(aa.allocated, 0)
                 AS unfilled,
               sa.supply - COALESCE(aa.allocated, 0) AS leftover
        FROM sa LEFT JOIN da ON da.pk = sa.pk
        LEFT JOIN aa ON aa.pk = sa.pk""")
    ) { (s, dir) =>
      def stream(status: String): DataFrame = {
        val w = Window.partitionBy("pk")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        t(s, dir, "lineitem").filter(col("l_linestatus") === status)
          .select(col("l_partkey").as("pk"),
            col("l_quantity").cast("long").as("q"),
            col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .withColumn("hi", sum(col("q")).over(w))
          .select("pk", "q", "hi")
      }
      val sup = stream("F")
      val dem = stream("O")
      // both interval streams are corpus-sized: the allocation join is
      // pinned sort-merge on pk (the planner's size estimate for the
      // demand side is optimistic enough to broadcast — a 100× OOM)
      val al = sup.select(col("pk"), col("q").as("sq"), col("hi").as("sh"))
        .join(dem.select(col("pk"), col("q").as("dq"), col("hi").as("dh"))
          .hint("merge"), Seq("pk"))
        .filter(col("sh") - col("sq") < col("dh") &&
          col("dh") - col("dq") < col("sh"))
        .select(col("pk"),
          (least(col("sh"), col("dh"))
            - greatest(col("sh") - col("sq"), col("dh") - col("dq")))
            .as("alloc"))
      // the three summary tables are PART-space — they grow with the
      // corpus, so the report joins are pinned to sort-merge (the
      // static planner would happily broadcast their optimistic size
      // estimates; at 100× that is a driver collect of |parts| rows)
      val sa = sup.groupBy("pk")
        .agg(count(lit(1)).as("n_lots"), sum(col("q")).as("supply"))
      val da = dem.groupBy("pk")
        .agg(count(lit(1)).as("n_demands"), sum(col("q")).as("demand"))
        .hint("merge")
      val aa = al.groupBy("pk").agg(sum(col("alloc")).as("allocated"))
        .hint("merge")
      sa.join(da, Seq("pk"), "left").join(aa, Seq("pk"), "left")
        .select(col("pk").as("partkey"), col("n_lots"),
          coalesce(col("n_demands"), lit(0L)).as("n_demands"),
          col("supply"), coalesce(col("demand"), lit(0L)).as("demand"),
          coalesce(col("allocated"), lit(0L)).as("allocated"),
          (coalesce(col("demand"), lit(0L))
            - coalesce(col("allocated"), lit(0L))).as("unfilled"),
          (col("supply") - coalesce(col("allocated"), lit(0L)))
            .as("leftover"))
    },

    // --------------------------------------------------------------- q232
    // Lorenz concentration deciles of customer spend — the curve
    // behind q152's Gini scalar: customers rank by exact spend cents
    // (zero-spend customers stay in, dropping them flatters the
    // curve), decile = ⌊10·(rank−1)/n⌋, and each decile reports its
    // share and cumulative share of total spend in exact permille.
    // The Spark plan is the two-phase bucket form (q243's move, no
    // corpus-sized rank window anywhere): per-customer cents collapse
    // into value groups, value groups into $1000 buckets; the ONLY
    // unpartitioned cumsum runs over the bounded bucket table, whole
    // buckets map to their decile arithmetically, and the ≤9 buckets
    // that straddle a decile boundary resolve via a PARTITIONED
    // per-bucket window (≤100k value rows each by bucket width) with
    // equal-cents groups split across deciles by exact integer
    // arithmetic — valid because equal-spend customers are
    // interchangeable for count/sum reporting, so which of them lands
    // on which side of a boundary cannot change any output cell. The
    // oracle keeps the direct global-rank form; the hash match proves
    // the two plans identical. The "top decile holds X% of revenue"
    // report every account-concentration review wants, reproducible
    // to the permille — and the sort is now per-bucket, not corpus.
    Q(
      "q232_lorenz_deciles",
      Some("""
        WITH sp AS (
          SELECT c.c_custkey AS ck,
                 COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))
                                   * 100) AS BIGINT), 0) AS cents
          FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
          GROUP BY 1),
        rk AS (
          SELECT cents,
                 ROW_NUMBER() OVER (ORDER BY cents, ck) AS rn,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n,
                 CAST(SUM(cents) OVER () AS BIGINT) AS total
          FROM sp),
        dec AS (
          SELECT (10 * (rn - 1)) // n AS decile,
                 CAST(COUNT(*) AS BIGINT) AS n_customers,
                 CAST(SUM(cents) AS BIGINT) AS cents,
                 MAX(total) AS total
          FROM rk GROUP BY 1)
        SELECT decile, n_customers, cents,
               (1000 * cents) // total AS share_pm,
               (1000 * CAST(SUM(cents) OVER (ORDER BY decile) AS BIGINT))
                 // total AS cum_share_pm
        FROM dec""")
    ) { (s, dir) =>
      val sp = t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"),
          "left")
        .groupBy(col("c_custkey").as("ck"))
        .agg(coalesce(expr(
          "cast(sum(cast(o_totalprice as decimal(18,4)) * 100) as bigint)"),
          lit(0L)).as("cents"))
      // phase 1: value groups (distinct spend levels), then $1000
      // buckets — both map-side-combinable aggregates
      val vg = sp.groupBy(col("cents")).agg(count(lit(1)).as("c"))
        .withColumn("bucket", expr("cents div 100000"))
      val bk = vg.groupBy(col("bucket"))
        .agg(sum(col("c")).as("bc"), sum(expr("c * cents")).as("bcents"))
      val nt = bk.agg(sum(col("bc")).as("n"), sum(col("bcents")).as("total"))
      // the one unpartitioned cumsum: over the BOUNDED bucket table
      val bkn = bk
        .withColumn("below_b",
          sum(col("bc")).over(Window.orderBy("bucket")) - col("bc"))
        .crossJoin(broadcast(nt))
        .withColumn("d0", expr("(10 * below_b) div n"))
        .withColumn("d1", expr("(10 * (below_b + bc - 1)) div n"))
      // buckets wholly inside one decile contribute as a unit
      val whole = bkn.filter(col("d0") === col("d1"))
        .select(col("d0").as("decile"), col("bc").as("n_customers"),
          col("bcents").as("cents"))
      // ≤9 straddlers (each holds ≥1 of the 9 boundaries) → broadcast
      val strad = bkn.filter(col("d0") =!= col("d1"))
        .select(col("bucket"), col("below_b"), col("n"))
      // decile d covers global ranks [⌈d·n/10⌉+1, ⌈((d+1)·n)/10⌉−…]:
      // lo_d = (d·n+9) div 10 + 1, hi_d = ((d+1)·n−1) div 10 + 1;
      // a value group at ranks [below_v+1, below_v+c] sends the
      // overlap count k (and k·cents) to each intersected decile
      val split = vg.join(broadcast(strad), "bucket")
        .withColumn("below_v", col("below_b")
          + sum(col("c")).over(Window.partitionBy("bucket").orderBy("cents"))
          - col("c"))
        .withColumn("decile", explode(expr(
          "sequence((10 * below_v) div n, (10 * (below_v + c - 1)) div n)")))
        .withColumn("k",
          least(expr("((decile + 1) * n - 1) div 10 + 1"),
            col("below_v") + col("c"))
          - greatest(expr("(decile * n + 9) div 10 + 1"),
            col("below_v") + 1) + lit(1L))
        .filter(col("k") > 0)
        .groupBy(col("decile"))
        .agg(sum(col("k")).as("n_customers"),
          sum(col("k") * col("cents")).as("cents"))
      val dec = whole.unionByName(split)
        .groupBy(col("decile"))
        .agg(sum(col("n_customers")).as("n_customers"),
          sum(col("cents")).as("cents"))
        .crossJoin(broadcast(nt))
      dec.select(col("decile"), col("n_customers"), col("cents"),
        expr("(1000 * cents) div total").as("share_pm"),
        expr("(1000 * sum(cents) over (order by decile)) div total")
          .as("cum_share_pm"))
    },

    // --------------------------------------------------------------- q243
    // Two-phase EXACT median — the distributed pattern for an exact
    // order statistic that q96's sketch only bounds: phase 1
    // aggregates the corpus into $1000-wide price buckets (map-side
    // combinable, one exchange) and locates the bucket containing
    // rank ⌈n/2⌉ via a value-space cumsum; phase 2 re-reads the price
    // column (pruned to ONE column; the derived-bucket predicate
    // filters in codegen right above the scan — a computed quantized
    // cast cannot reach parquet stats) so only the located bucket's
    // rows survive to the rank window, which sorts n/|buckets| rows
    // instead of n — at 100 TB that sort is the win, and a writer
    // that stores cents as a real column gets stats pruning on the
    // re-read too. If a bucket ever skews too wide,
    // the same two-phase step recurses on sub-buckets (documented,
    // not needed at these SFs). Output: n, target rank, located
    // bucket, both phase row counts, and the exact median in cents.
    Q(
      "q243_exact_median",
      Some("""
        WITH v AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100
                      AS BIGINT) AS cents
          FROM lineitem),
        b AS (
          SELECT cents // 100000 AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM v GROUP BY 1),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM b),
        cum AS (
          SELECT bucket, c,
                 CAST(SUM(c) OVER (ORDER BY bucket) AS BIGINT) AS cc
          FROM b),
        loc AS (
          SELECT bucket, cc - c AS below, c AS in_bucket
          FROM cum CROSS JOIN n
          WHERE cc >= (n.n + 1) // 2 AND cc - c < (n.n + 1) // 2),
        ranked AS (
          SELECT v.cents,
                 ROW_NUMBER() OVER (ORDER BY v.cents) AS rn
          FROM v CROSS JOIN loc
          WHERE v.cents // 100000 = loc.bucket)
        SELECT n.n, (n.n + 1) // 2 AS target_rank, loc.bucket,
               loc.in_bucket AS phase2_rows,
               r.cents AS median_cents
        FROM ranked r CROSS JOIN loc CROSS JOIN n
        WHERE r.rn = (n.n + 1) // 2 - loc.below""")
    ) { (s, dir) =>
      val v = t(s, dir, "lineitem").select(
        expr("cast(cast(l_extendedprice as decimal(18,4)) * 100 as bigint)")
          .as("cents"))
      val b = v.groupBy(expr("cents div 100000").as("bucket"))
        .agg(count(lit(1)).as("c"))
      val n = b.agg(sum(col("c")).as("n"))
      val cum = b.withColumn("cc", sum(col("c")).over(Window.orderBy("bucket")))
      val loc = cum.crossJoin(broadcast(n))
        .filter(col("cc") >= expr("(n + 1) div 2")
          && col("cc") - col("c") < expr("(n + 1) div 2"))
        .select(col("bucket"), (col("cc") - col("c")).as("below"),
          col("c").as("in_bucket"), col("n"))
      // phase 2: one bucket rescans with the predicate pushed down;
      // the located bucket is a one-row broadcast. The rank window
      // PARTITIONS BY bucket: exactly one bucket survives the filter,
      // so the result is identical — and the window's per-group scope
      // (sorts n/|buckets| rows, never the corpus) is declared in the
      // plan itself, which the global unpartitioned-window sweep pins.
      val ranked = v.crossJoin(broadcast(loc))
        .filter(expr("cents div 100000") === col("bucket"))
        .withColumn("rn",
          row_number().over(Window.partitionBy("bucket").orderBy("cents")))
      ranked.filter(col("rn") === expr("(n + 1) div 2") - col("below"))
        .select(col("n"), expr("(n + 1) div 2").as("target_rank"),
          col("bucket"), col("in_bucket").as("phase2_rows"),
          col("cents").as("median_cents"))
    },

    // --------------------------------------------------------------- q245
    // Partition-grain snapshot diff plan — the incremental-sync
    // planner: given yesterday's orders and today's (simulated: the
    // newest month's totals restate by one cent — a late-arriving
    // correction), roll each version up to per-month (row count,
    // order-free checksum) and emit ONLY months whose fingerprints
    // disagree. Sync cost drops from the table to the changed
    // partitions — the plan a lakehouse CDC shipper executes. The
    // checksum is q112's order-free md5-prefix sum (one md5 per row,
    // decimal-banked, mod 2⁶²); both versions derive from one scan
    // pass each; the diff is month-space. At 100 TB: two corpus
    // passes + a |months| join — scales.
    Q(
      "q245_partition_diff",
      Some {
        val poly = (0 until 12).map { p =>
          s"(instr('0123456789abcdef', substr(h, ${12 - p}, 1)) - 1) * ${1L << (4 * p)}"
        }.mkString(" + ")
        def side(expr2: String) = s"""
          SELECT mon, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST($poly AS DECIMAL(38,0)))
                      % 4611686018427387904 AS BIGINT) AS cksum
          FROM (
            SELECT year(CAST(o_orderdate AS DATE)) * 100
                   + month(CAST(o_orderdate AS DATE)) AS mon,
                   md5(concat_ws('|', o_orderkey, o_orderstatus,
                       CAST($expr2 AS VARCHAR))) AS h
            FROM orders) t
          GROUP BY mon"""
        val restated = """CASE WHEN year(CAST(o_orderdate AS DATE)) * 100
                   + month(CAST(o_orderdate AS DATE)) =
                   (SELECT MAX(year(CAST(o_orderdate AS DATE)) * 100
                    + month(CAST(o_orderdate AS DATE))) FROM orders)
              THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) + 1
              ELSE CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) END"""
        s"""
        WITH v1 AS (${side("CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)")}),
        v2 AS (${side(restated)})
        SELECT v1.mon, v1.n AS n_old, v2.n AS n_new,
               v1.cksum <> v2.cksum AS changed
        FROM v1 JOIN v2 ON v2.mon = v1.mon
        WHERE v1.cksum <> v2.cksum OR v1.n <> v2.n"""
      }
    ) { (s, dir) =>
      val base = t(s, dir, "orders").select(
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("mon"),
        col("o_orderkey"), col("o_orderstatus"),
        expr("cast(cast(o_totalprice as decimal(18,4)) * 100 as bigint)")
          .as("cents"))
      val maxMon = base.agg(max(col("mon")).as("mx"))
      def rollup(df: DataFrame): DataFrame =
        df.select(col("mon"),
          expr("md5(concat_ws('|', o_orderkey, o_orderstatus, " +
            "CAST(__c AS STRING)))").as("h"))
          .groupBy("mon")
          .agg(count(lit(1)).as("n"),
            expr("""CAST(SUM(CAST(conv(substring(h, 1, 12), 16, 10)
                     AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT)""")
              .as("cksum"))
      val v1 = rollup(base.withColumn("__c", col("cents")))
      val v2 = rollup(base.crossJoin(broadcast(maxMon))
        .withColumn("__c",
          when(col("mon") === col("mx"), col("cents") + 1)
            .otherwise(col("cents"))))
      v1.select(col("mon"), col("n").as("n_old"), col("cksum").as("ck1"))
        .join(v2.select(col("mon"), col("n").as("n_new"),
          col("cksum").as("ck2")), "mon")
        .filter(col("ck1") =!= col("ck2") || col("n_old") =!= col("n_new"))
        .select(col("mon"), col("n_old"), col("n_new"),
          (col("ck1") =!= col("ck2")).as("changed"))
    },

    // --------------------------------------------------------------- q246
    // Join-cardinality estimator audit — validate the uniform-
    // frequency assumption every cost-based optimizer leans on:
    // for each order month, the estimated orders⋈lineitem output
    // under |O_m|·(|L|/|O|) vs the ACTUAL per-month join size, error
    // in signed permille (cross-multiplied exact integers). Months
    // where the estimate misses by > 10% are exactly where a CBO
    // would pick the wrong join order without histogram stats — the
    // motivating table for q131's skew report. One orders pass + one
    // keyed join rollup; month-space after.
    Q(
      "q246_cardinality_audit",
      Some("""
        WITH o AS (
          SELECT o_orderkey,
                 year(CAST(o_orderdate AS DATE)) * 100
                 + month(CAST(o_orderdate AS DATE)) AS mon
          FROM orders),
        om AS (SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_o
               FROM o GROUP BY 1),
        tot AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_l,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_o_all),
        act AS (
          SELECT o.mon, CAST(COUNT(*) AS BIGINT) AS actual
          FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
          GROUP BY 1)
        SELECT om.mon, om.n_o,
               (om.n_o * tot.n_l) // tot.n_o_all AS estimated,
               COALESCE(act.actual, 0) AS actual,
               CASE WHEN COALESCE(act.actual, 0) > 0
                    THEN (1000 * ((om.n_o * tot.n_l) // tot.n_o_all
                          - act.actual)) // act.actual
                    ELSE 0 END AS err_pm
        FROM om CROSS JOIN tot
        LEFT JOIN act ON act.mon = om.mon""")
    ) { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("mon"))
      val om = o.groupBy("mon").agg(count(lit(1)).as("n_o"))
      val tot = t(s, dir, "lineitem").agg(count(lit(1)).as("n_l"))
        .crossJoin(t(s, dir, "orders").agg(count(lit(1)).as("n_o_all")))
      val act = t(s, dir, "lineitem").select(col("l_orderkey"))
        .join(o.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("mon").agg(count(lit(1)).as("actual"))
      om.crossJoin(broadcast(tot))
        .join(act, Seq("mon"), "left").na.fill(0L, Seq("actual"))
        .select(col("mon"), col("n_o"),
          expr("(n_o * n_l) div n_o_all").as("estimated"),
          col("actual"),
          when(col("actual") > 0,
            expr("(1000 * ((n_o * n_l) div n_o_all - actual)) div actual"))
            .otherwise(0L).as("err_pm"))
    },

    // --------------------------------------------------------------- q249
    // Skew-salting routing table — the executable successor to q131's
    // diagnostics and the input q46's salted join consumes: per join
    // key (supplier), its row count and the salt fanout n_salts =
    // ⌈count / target⌉ (target = 256 rows per salted partition here;
    // a config in production). Emitting the FULL routing table — not
    // only the hot keys — is deliberate: the salted-join build side
    // replicates each key n_salts times, so the planner needs every
    // key's fanout, and the table is dimension-sized (|suppliers|),
    // which broadcasts. One map-side-combinable corpus count; the
    // salted share tells whether salting is worth the replication.
    Q(
      "q249_salting_plan",
      Some("""
        WITH c AS (
          SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM lineitem GROUP BY 1)
        SELECT l_suppkey, cnt,
               (cnt + 255) // 256 AS n_salts,
               cnt > 256 AS salted
        FROM c""")
    ) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
        .select(col("l_suppkey"), col("cnt"),
          expr("(cnt + 255) div 256").as("n_salts"),
          (col("cnt") > 256).as("salted"))
    },

    // --------------------------------------------------------------- q250
    // Incremental join-view maintenance — the delta-rule algebra
    // behind every materialized view refresh: for the month-grain
    // join view V = |σ_m(O ⋈ L)|, with disjoint splits O = O_b ∪ ΔO
    // and L = L_b ∪ ΔL (deterministic key-mod splits simulating a new
    // ingest batch), the refresh is ΔV = ΔO⋈L_b + O_b⋈ΔL + ΔO⋈ΔL —
    // three KEYED delta joins whose sides are delta-sized where it
    // matters, instead of recomputing the full join. The query emits
    // both the incremental result and the direct recomputation with a
    // consistency flag per month — the self-auditing refresh. At
    // 100 TB the full-join term never runs: ΔO⋈L_b streams the delta
    // against the base index, the classic IVM win.
    Q(
      "q250_incremental_join_view",
      Some("""
        WITH ob AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
        od AS (SELECT * FROM orders WHERE o_orderkey % 10 = 0),
        lb AS (SELECT * FROM lineitem WHERE l_orderkey % 7 <> 0),
        ld AS (SELECT * FROM lineitem WHERE l_orderkey % 7 = 0),
        base AS (
          SELECT year(CAST(o.o_orderdate AS DATE)) * 100
                 + month(CAST(o.o_orderdate AS DATE)) AS mon,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM ob o JOIN lb l ON l.l_orderkey = o.o_orderkey GROUP BY 1),
        d1 AS (
          SELECT year(CAST(o.o_orderdate AS DATE)) * 100
                 + month(CAST(o.o_orderdate AS DATE)) AS mon,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM od o JOIN lb l ON l.l_orderkey = o.o_orderkey GROUP BY 1),
        d2 AS (
          SELECT year(CAST(o.o_orderdate AS DATE)) * 100
                 + month(CAST(o.o_orderdate AS DATE)) AS mon,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM ob o JOIN ld l ON l.l_orderkey = o.o_orderkey GROUP BY 1),
        d3 AS (
          SELECT year(CAST(o.o_orderdate AS DATE)) * 100
                 + month(CAST(o.o_orderdate AS DATE)) AS mon,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM od o JOIN ld l ON l.l_orderkey = o.o_orderkey GROUP BY 1),
        direct AS (
          SELECT year(CAST(o.o_orderdate AS DATE)) * 100
                 + month(CAST(o.o_orderdate AS DATE)) AS mon,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          GROUP BY 1),
        mons AS (SELECT DISTINCT mon FROM direct)
        SELECT m.mon,
               COALESCE(b.v, 0) AS v_base,
               COALESCE(d1.v, 0) AS delta_o,
               COALESCE(d2.v, 0) AS delta_l,
               COALESCE(d3.v, 0) AS delta_both,
               COALESCE(b.v, 0) + COALESCE(d1.v, 0) + COALESCE(d2.v, 0)
                 + COALESCE(d3.v, 0) AS v_incremental,
               dd.v AS v_direct,
               COALESCE(b.v, 0) + COALESCE(d1.v, 0) + COALESCE(d2.v, 0)
                 + COALESCE(d3.v, 0) = dd.v AS consistent
        FROM mons m
        JOIN direct dd ON dd.mon = m.mon
        LEFT JOIN base b ON b.mon = m.mon
        LEFT JOIN d1 ON d1.mon = m.mon
        LEFT JOIN d2 ON d2.mon = m.mon
        LEFT JOIN d3 ON d3.mon = m.mon""")
    ) { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("mon"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"))
      val ob = o.filter(col("o_orderkey") % 10 =!= 0)
      val od = o.filter(col("o_orderkey") % 10 === 0)
      val lb = l.filter(col("l_orderkey") % 7 =!= 0)
      val ld = l.filter(col("l_orderkey") % 7 === 0)
      def viewOf(os: DataFrame, ls: DataFrame, name: String): DataFrame =
        ls.join(os.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("mon").agg(count(lit(1)).as(name))
      val base = viewOf(ob, lb, "v_base")
      val d1 = viewOf(od, lb, "delta_o")
      val d2 = viewOf(ob, ld, "delta_l")
      val d3 = viewOf(od, ld, "delta_both")
      val direct = viewOf(o, l, "v_direct")
      direct
        .join(base, Seq("mon"), "left")
        .join(d1, Seq("mon"), "left")
        .join(d2, Seq("mon"), "left")
        .join(d3, Seq("mon"), "left")
        .na.fill(0L, Seq("v_base", "delta_o", "delta_l", "delta_both"))
        .select(col("mon"), col("v_base"), col("delta_o"), col("delta_l"),
          col("delta_both"),
          (col("v_base") + col("delta_o") + col("delta_l")
            + col("delta_both")).as("v_incremental"),
          col("v_direct"),
          ((col("v_base") + col("delta_o") + col("delta_l")
            + col("delta_both")) === col("v_direct")).as("consistent"))
    },

    // --------------------------------------------------------------- q256
    // Stock aging report — how OLD is the unsold inventory? Under
    // q226's FIFO semantics the unconsumed units of a lot covering
    // cumulative range [s_lo, s_hi) against total part demand D are
    // exactly max(0, s_hi − max(s_lo, D)) — closed form, NO
    // allocation join needed (the demand total is a part-space
    // aggregate that joins back keyed). Leftover units bucket by lot
    // age (days since ship, 30-day buckets against the fixture
    // horizon — a one-row broadcast). The writedown report every
    // inventory review wants: old stock is dead stock, and FIFO
    // means the leftovers are always the NEWEST units — which this
    // query makes visible. One per-part cumsum window + one keyed
    // join + a bucket-space rollup — scales.
    Q(
      "q256_stock_aging",
      Some("""
        WITH hz AS (
          SELECT MAX(epoch_us(CAST(l_shipdate AS TIMESTAMP))
                     // 86400000000) AS h
          FROM lineitem),
        sup AS (
          SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
                 epoch_us(CAST(l_shipdate AS TIMESTAMP))
                   // 86400000000 AS sd,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT)
                   AS hi
          FROM lineitem WHERE l_linestatus = 'F'
          WINDOW w AS (PARTITION BY l_partkey
                       ORDER BY l_shipdate, l_orderkey, l_linenumber)),
        dem AS (
          SELECT l_partkey AS pk,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
          FROM lineitem WHERE l_linestatus = 'O' GROUP BY 1),
        lo AS (
          SELECT s.pk, s.sd,
                 greatest(0, s.hi - greatest(s.hi - s.q,
                   COALESCE(dem.d, 0))) AS leftover
          FROM sup s LEFT JOIN dem ON dem.pk = s.pk)
        SELECT (hz.h - lo.sd) // 30 AS age_bucket_30d,
               CAST(COUNT(*) AS BIGINT) AS n_lots,
               CAST(SUM(lo.leftover) AS BIGINT) AS leftover_qty
        FROM lo CROSS JOIN hz
        WHERE lo.leftover > 0
        GROUP BY 1""")
    ) { (s, dir) =>
      val wq = Window.partitionBy("pk")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      val sup = t(s, dir, "lineitem").filter(col("l_linestatus") === "F")
        .select(col("l_partkey").as("pk"),
          col("l_quantity").cast("long").as("q"),
          expr("unix_micros(cast(l_shipdate as timestamp))" +
            " div 86400000000").as("sd"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("hi", sum(col("q")).over(wq))
      val dem = t(s, dir, "lineitem").filter(col("l_linestatus") === "O")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("d"))
        .hint("merge")
      val hz = t(s, dir, "lineitem")
        .agg(expr("max(unix_micros(cast(l_shipdate as timestamp))" +
          " div 86400000000)").as("h"))
      sup.join(dem, Seq("pk"), "left").na.fill(0L, Seq("d"))
        .select(col("sd"),
          greatest(lit(0L), col("hi")
            - greatest(col("hi") - col("q"), col("d"))).as("leftover"))
        .filter(col("leftover") > 0)
        .crossJoin(broadcast(hz))
        .groupBy(expr("(h - sd) div 30").as("age_bucket_30d"))
        .agg(count(lit(1)).as("n_lots"),
          sum(col("leftover")).as("leftover_qty"))
    },

    // --------------------------------------------------------------- q251
    // Correlated-sampling join estimation — WHY join samples must
    // share the join key's hash: sampling BOTH sides by the same
    // key-hash bucket (Knuth mod 16 = 0) makes the sample join an
    // exact 1/16 key-universe sample of the true join (every kept
    // key keeps ALL its rows on both sides), so est = 16·|sample ⋈|.
    // Independent per-row samples (order side by orderkey, line side
    // by a different (orderkey, linenumber) hash) intersect with
    // probability 1/256 and the ×256 scale-up carries the variance —
    // the estimator a naive sampler ships and the error this query
    // makes visible next to q246's uniform-frequency estimate. Both
    // samples are deterministic salted hashes (no rand()); per-month
    // actual, the three estimates, and signed-permille errors. At
    // 100 TB the sample join touches 1/16 of keys — the whole point.
    Q(
      "q251_sample_estimate",
      Some("""
        WITH o AS (
          SELECT o_orderkey,
                 year(CAST(o_orderdate AS DATE)) * 100
                 + month(CAST(o_orderdate AS DATE)) AS mon
          FROM orders),
        act AS (
          SELECT o.mon, CAST(COUNT(*) AS BIGINT) AS actual
          FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
          GROUP BY 1),
        ck AS (
          SELECT o.mon, CAST(16 * COUNT(*) AS BIGINT) AS est_corr
          FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
          WHERE ((l.l_orderkey + 9176) % 2147483648) * 2654435761
                % 4294967296 % 16 = 0
          GROUP BY 1),
        ind AS (
          SELECT o.mon, CAST(256 * COUNT(*) AS BIGINT) AS est_indep
          FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
          WHERE ((o.o_orderkey + 9176) % 2147483648) * 2654435761
                % 4294967296 % 16 = 0
            AND ((l.l_orderkey * 8 + l.l_linenumber + 5189) % 2147483648)
                * 2654435761 % 4294967296 % 16 = 0
          GROUP BY 1)
        SELECT act.mon, act.actual,
               COALESCE(ck.est_corr, 0) AS est_corr,
               COALESCE(ind.est_indep, 0) AS est_indep,
               (1000 * (COALESCE(ck.est_corr, 0) - act.actual))
                 // act.actual AS err_corr_pm,
               (1000 * (COALESCE(ind.est_indep, 0) - act.actual))
                 // act.actual AS err_indep_pm
        FROM act
        LEFT JOIN ck ON ck.mon = act.mon
        LEFT JOIN ind ON ind.mon = act.mon""")
    ) { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("mon"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
      def keyHash(c: String, salt: Long) =
        expr(s"(($c + $salt) % 2147483648) * 2654435761 % 4294967296 % 16")
      // one corpus join pass: actual and both sampled counts fold into
      // conditional aggregates (three separate aggregations over the
      // shared join subtree would re-execute it three times)
      val joined = li.join(o.hint("shuffle_hash"),
        col("o_orderkey") === col("l_orderkey"))
      joined.groupBy("mon").agg(
          count(lit(1)).as("actual"),
          (lit(16L) * sum(when(keyHash("l_orderkey", 9176L) === 0, 1L)
            .otherwise(0L))).as("est_corr"),
          (lit(256L) * sum(when(keyHash("o_orderkey", 9176L) === 0 &&
            expr("((l_orderkey * 8 + l_linenumber + 5189) % 2147483648)" +
              " * 2654435761 % 4294967296 % 16") === 0, 1L)
            .otherwise(0L))).as("est_indep"))
        .select(col("mon"), col("actual"), col("est_corr"), col("est_indep"),
          expr("(1000 * (est_corr - actual)) div actual").as("err_corr_pm"),
          expr("(1000 * (est_indep - actual)) div actual")
            .as("err_indep_pm"))
    },

    // --------------------------------------------------------------- q252
    // Erasure cascade plan — the GDPR/right-to-be-forgotten dry run:
    // given the subjects to erase (here custkey ≡ 0 mod 97, a
    // deterministic stand-in for a request list), the plan walks the
    // foreign-key cascade customer → orders → lineitem and reports
    // rows and estimated bytes per table BEFORE any delete runs —
    // the artifact a compliance review and the deletion job both
    // consume (q248's policy twin, driven by identity instead of
    // recency). Cascades are keyed semi-join aggregations: subjects
    // broadcast (request lists are small by nature), orders keyed on
    // custkey, lineitems keyed on the cascaded orderkeys — no corpus
    // side ever broadcasts. Output: table, rows_affected, est_bytes.
    Q(
      "q252_erasure_plan",
      Some("""
        WITH vic AS (
          SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        vo AS (
          SELECT o_orderkey FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM vic)),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vic),
        no_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vo),
        nl AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM vo))
        SELECT 'customer' AS tbl, n AS rows_affected,
               80 * n AS est_bytes FROM nc
        UNION ALL SELECT 'orders', n, 88 * n FROM no_
        UNION ALL SELECT 'lineitem', n, 120 * n FROM nl""")
    ) { (s, dir) =>
      val vic = t(s, dir, "customer")
        .filter(col("c_custkey") % 97 === 0).select("c_custkey")
      val vo = t(s, dir, "orders")
        .join(broadcast(vic), col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("o_orderkey")
      val nl = t(s, dir, "lineitem")
        .join(vo.hint("shuffle_hash"), col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .agg(count(lit(1)).as("n"))
      val nc = vic.agg(count(lit(1)).as("n"))
      val no = vo.agg(count(lit(1)).as("n"))
      nc.select(lit("customer").as("tbl"), col("n").as("rows_affected"),
          (lit(80L) * col("n")).as("est_bytes"))
        .unionByName(no.select(lit("orders").as("tbl"),
          col("n").as("rows_affected"), (lit(88L) * col("n")).as("est_bytes")))
        .unionByName(nl.select(lit("lineitem").as("tbl"),
          col("n").as("rows_affected"),
          (lit(120L) * col("n")).as("est_bytes")))
    },
  )
}
