#!/usr/bin/env python3
"""Build a 10x scale-stress fixture (sf1) from /root/testdata/sf0.1.

Replicates each fact table 10x with consistent key remapping (every
foreign key shifts by the same replica offset, so join cardinalities
scale linearly and keys stay unique). Dimension tables (region, nation)
are fixed-cardinality and copied as-is. Text/embedding payloads repeat
— fine for a THROUGHPUT drill (the bench queries' work scales with
rows), though dedup-family queries will see 10x planted duplicates.

Usage: python3 scripts/make_sf1.py [outdir]   (default /tmp/sf1)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = 10  # replicas

con = duckdb.connect()
con.execute("PRAGMA threads=16")

import os
os.makedirs(OUT, exist_ok=True)


def copy(table):
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")


def replicate(table, expr):
    """expr uses r (replica index 0..R-1) and the source columns."""
    con.execute(
        f"COPY (SELECT {expr} FROM read_parquet('{SRC}/{table}.parquet') "
        f"CROSS JOIN (SELECT unnest(range({R})) AS r) reps) "
        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")


# key strides: one replica's keyspace, rounded up to a clean power of 10
S = {"cust": 100000, "supp": 10000, "part": 100000, "order": 10000000,
     "event": 10000000, "doc": 100000, "vec": 100000, "user": 100000}

copy("region")
copy("nation")
replicate("customer",
          f"c_custkey + r*{S['cust']} AS c_custkey, c_name, c_nationkey, "
          "c_acctbal, c_mktsegment")
replicate("supplier",
          f"s_suppkey + r*{S['supp']} AS s_suppkey, s_name, s_nationkey, s_acctbal")
replicate("part",
          f"p_partkey + r*{S['part']} AS p_partkey, p_name, p_brand, p_type, "
          "p_size, p_retailprice")
replicate("orders",
          f"o_orderkey + r*{S['order']} AS o_orderkey, "
          f"o_custkey + r*{S['cust']} AS o_custkey, "
          "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
replicate("lineitem",
          f"l_orderkey + r*{S['order']} AS l_orderkey, "
          f"l_partkey + r*{S['part']} AS l_partkey, "
          f"l_suppkey + r*{S['supp']} AS l_suppkey, "
          "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
          "l_returnflag, l_linestatus, l_shipdate")
replicate("events",
          f"event_id + r*{S['event']} AS event_id, "
          f"ts + to_microseconds(r) AS ts, "  # keep day grain, break exact ts ties
          f"user_id + r*{S['user']} AS user_id, event_type, value, props")
replicate("documents",
          f"doc_id + r*{S['doc']} AS doc_id, text, lang, source, n_chars")
replicate("embeddings",
          f"vec_id + r*{S['vec']} AS vec_id, embedding, label")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n}")
print(f"sf1 fixture at {OUT}")
