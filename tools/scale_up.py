#!/usr/bin/env python3
"""Replicate a driver testdata dir N x with consistent key offsets —
the r16 "sf1 soak" input builder (VERDICT r15 task 8).

The driver generates sf{0.001,0.01,0.1}; everything is oracle-verified
there, but cardinality-dependent code (bucket caps, maxPostings, guard
thresholds, AQE plan flips) only comes under pressure at a larger SF.
This tool builds a 10x copy of sf0.1 (~sf1: 6M lineitem rows) in /tmp
by UNION-ing N offset copies of every fact table, preserving
referential integrity:

  - every key column offsets by copy_index * domain_cap, the same cap
    on both sides of each FK (orders.o_custkey and customer.c_custkey
    share the custkey cap), so joins produce exactly N disjoint copies
    of the base join graph;
  - region/nation stay UNREPLICATED (fixed dimensions at every TPC-H
    SF; c_nationkey/s_nationkey survive verbatim);
  - document text gets a per-copy suffix token (and n_chars follows) so
    the dedup/similarity families see a 10x corpus rather than a
    degenerate 10-way exact-duplicate explosion; copy 0 is byte-
    identical to the source, so every base duplicate pair survives;
  - embeddings replicate verbatim (identical vectors across copies are
    legitimate near-dup pressure; top-k oracles tie-break on id).

Both engines (Spark's Verify and DuckDB's local_check) read the SAME
files this writes, so the oracle comparison stays valid at the new SF.

Usage: python3 tools/scale_up.py [src] [dst] [copies]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key-domain caps (row counts of sf0.1; ids are 0/1-based dense, so the
# count is a safe stride)
CUST, SUPP, PART, ORD = 15_000, 1_000, 20_000, 150_000
EVENT, USERS, DOC, VEC = 100_000, None, 5_000, 2_000

TABLES = {
    # replicated verbatim (fixed dimensions)
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""
        SELECT c_custkey + i*{CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM src, range({N}) t(i)""",
    "supplier": f"""
        SELECT s_suppkey + i*{SUPP} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM src, range({N}) t(i)""",
    "part": f"""
        SELECT p_partkey + i*{PART} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM src, range({N}) t(i)""",
    "orders": f"""
        SELECT o_orderkey + i*{ORD} AS o_orderkey,
               o_custkey + i*{CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src, range({N}) t(i)""",
    "lineitem": f"""
        SELECT l_orderkey + i*{ORD} AS l_orderkey,
               l_partkey + i*{PART} AS l_partkey,
               l_suppkey + i*{SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src, range({N}) t(i)""",
    # user_id domain scales with the copies (sessionize/state pressure);
    # its cap is computed from the data below
    "events": f"""
        SELECT event_id + i*{EVENT} AS event_id, ts,
               user_id + i*__USERS__ AS user_id,
               event_type, value, props
        FROM src, range({N}) t(i)""",
    "documents": f"""
        SELECT doc_id + i*{DOC} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE text || ' c' || CAST(i AS VARCHAR) END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE n_chars + 2 + length(CAST(i AS VARCHAR))
               END AS n_chars
        FROM src, range({N}) t(i)""",
    "embeddings": f"""
        SELECT vec_id + i*{VEC} AS vec_id, embedding, label
        FROM src, range({N}) t(i)""",
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    users = con.sql(
        f"SELECT max(user_id) + 1 FROM '{SRC}/events.parquet'").fetchone()[0]
    for name, q in TABLES.items():
        sql = q.replace("src", f"'{SRC}/{name}.parquet'") \
               .replace("__USERS__", str(users))
        con.sql(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
        print(f"[scale_up] {name}: {n} rows")


if __name__ == "__main__":
    main()
