#!/usr/bin/env python3
"""Deterministic scale-up fixture generator for the scaling dry-run.

Replicates the driver's sf0.1 tables K times with disjoint key strides
(foreign keys offset consistently, so every join still resolves inside
its own replica) and writes single-file parquet per table. Replica 0 is
byte-identical data; replicas i>0 perturb `documents.text` with a short
suffix (near-dup structure is preserved without making every doc an
exact 5-way duplicate) and shift `embeddings.embedding` by a tiny
per-replica epsilon (so ANN structure scales instead of collapsing
onto 5 identical copies). Timestamps are NOT shifted: a K× corpus over
the same time range is exactly the densification a bigger cluster sees.

Usage: python3 tools/gen_scale.py <src_sf_dir> <out_dir> <K>

Run once for K=1 and once for K=5: both measurement points then share
writer provenance (row-group layout, encodings), so the wall-time ratio
isolates the engine's scaling, not parquet-layout constants.
"""
import os
import sys

import duckdb

CUST = 1_000_000
SUPP = 1_000_000
PART = 1_000_000
ORD = 10_000_000
EVT = 10_000_000
DOC = 1_000_000
VEC = 1_000_000


def main(src, out, k):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({k})) AS i")

    def gen(name, select):
        dst = os.path.join(out, f"{name}.parquet")
        con.execute(
            f"COPY ({select}) TO '{dst}' (FORMAT PARQUET, CODEC SNAPPY)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{name}: {n} rows")

    def src_tbl(name):
        return f"read_parquet('{os.path.join(src, name + '.parquet')}')"

    # dimensions: shared across replicas
    gen("region", f"SELECT * FROM {src_tbl('region')}")
    gen("nation", f"SELECT * FROM {src_tbl('nation')}")

    gen("customer", f"""
        SELECT c_custkey + i * {CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src_tbl('customer')}, reps""")
    gen("supplier", f"""
        SELECT s_suppkey + i * {SUPP} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src_tbl('supplier')}, reps""")
    gen("part", f"""
        SELECT p_partkey + i * {PART} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM {src_tbl('part')}, reps""")
    gen("orders", f"""
        SELECT o_orderkey + i * {ORD} AS o_orderkey,
               o_custkey + i * {CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src_tbl('orders')}, reps""")
    gen("lineitem", f"""
        SELECT l_orderkey + i * {ORD} AS l_orderkey,
               l_partkey + i * {PART} AS l_partkey,
               l_suppkey + i * {SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src_tbl('lineitem')}, reps""")
    gen("events", f"""
        SELECT event_id + i * {EVT} AS event_id, ts,
               user_id + i * {CUST} AS user_id,
               event_type, value, props
        FROM {src_tbl('events')}, reps""")
    gen("documents", f"""
        SELECT doc_id + i * {DOC} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' r' || CAST(i AS VARCHAR) END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE text || ' r' || CAST(i AS VARCHAR) END) AS BIGINT)
                 AS n_chars
        FROM {src_tbl('documents')}, reps""")
    gen("embeddings", f"""
        SELECT vec_id + i * {VEC} AS vec_id,
               list_transform(embedding,
                 x -> CAST(x + i * 0.0001 AS REAL)) AS embedding,
               label
        FROM {src_tbl('embeddings')}, reps""")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
