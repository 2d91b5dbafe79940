#!/usr/bin/env python3
"""Generate an sf1 fixture set (10x sf0.1) for the SCALE.md smoke.

Driver-side tooling only (like check.py) -- NOT part of the library.
Scales /root/testdata/sf0.1 by 10x key-offset replication so every
distribution (value ranges, join fanout, skew, doc lengths) is
preserved exactly:

  - region/nation copied as-is (fixed-size dims, like TPC-H);
  - customer/supplier/part/orders/lineitem/events: 10 copies with all
    keys offset by copy * (max_key + 1), so per-key cardinalities and
    join selectivities match sf0.1 per copy;
  - documents: doc_id offset + per-copy word-level text rotation, so
    cross-copy shingle similarity is low and the dedup-family
    candidate sets scale linearly (plain replication would create 10
    near-identical copies of every doc => quadratic pair blowup the
    real corpus growth would not have);
  - embeddings: vec_id offset + per-copy cyclic vector rotation
    (norm-preserving, direction-changing) for the same reason.

Usage: python3 tools/gen_sf1.py [outdir]   (default /tmp/testdata-sf1)
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata-sf1"
COPIES = 10

con = duckdb.connect()
con.execute("PRAGMA threads=32")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def write(t, sql):
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET, "
        "COMPRESSION SNAPPY, ROW_GROUP_SIZE 122880)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")


import os

os.makedirs(OUT, exist_ok=True)

for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

# key strides: one per keyed table, max+1 so copies never collide
K = {}
for t, k in (("customer", "c_custkey"), ("supplier", "s_suppkey"),
             ("part", "p_partkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("events_u", "user_id"),
             ("documents", "doc_id"), ("embeddings", "vec_id")):
    tbl = "events" if t == "events_u" else t
    K[t] = con.sql(f"SELECT max({k}) + 1 FROM {src(tbl)}").fetchone()[0]

copies = f"(SELECT unnest(range({COPIES})) AS cp)"

write("customer", f"""
  SELECT c_custkey + cp * {K['customer']} AS c_custkey,
         * EXCLUDE (c_custkey, cp)
  FROM {src('customer')}, {copies}""")

write("supplier", f"""
  SELECT s_suppkey + cp * {K['supplier']} AS s_suppkey,
         * EXCLUDE (s_suppkey, cp)
  FROM {src('supplier')}, {copies}""")

write("part", f"""
  SELECT p_partkey + cp * {K['part']} AS p_partkey,
         * EXCLUDE (p_partkey, cp)
  FROM {src('part')}, {copies}""")

write("orders", f"""
  SELECT o_orderkey + cp * {K['orders']} AS o_orderkey,
         o_custkey + cp * {K['customer']} AS o_custkey,
         * EXCLUDE (o_orderkey, o_custkey, cp)
  FROM {src('orders')}, {copies}""")

write("lineitem", f"""
  SELECT l_orderkey + cp * {K['orders']} AS l_orderkey,
         l_partkey + cp * {K['part']} AS l_partkey,
         l_suppkey + cp * {K['supplier']} AS l_suppkey,
         * EXCLUDE (l_orderkey, l_partkey, l_suppkey, cp)
  FROM {src('lineitem')}, {copies}""")

write("events", f"""
  SELECT event_id + cp * {K['events']} AS event_id,
         ts,  -- written as timestamp[us]; Tables.df dispatches on physical type
         user_id + cp * {K['events_u']} AS user_id,
         event_type, value, props
  FROM {src('events')}, {copies}""")

# word-level rotation: same word multiset (length/token stats
# preserved), different shingle set per copy
write("documents", f"""
  WITH w AS (
    SELECT doc_id, string_split(text, ' ') AS ws, lang, source, cp
    FROM {src('documents')}, {copies})
  SELECT doc_id + cp * {K['documents']} AS doc_id,
         CASE WHEN cp = 0 OR len(ws) < 4 THEN array_to_string(ws, ' ')
              ELSE array_to_string(
                     ws[1 + (cp * 37) % len(ws):] ||
                     ws[:(cp * 37) % len(ws)], ' ')
         END AS text,
         lang, source,
         length(CASE WHEN cp = 0 OR len(ws) < 4
                     THEN array_to_string(ws, ' ')
                     ELSE array_to_string(
                            ws[1 + (cp * 37) % len(ws):] ||
                            ws[:(cp * 37) % len(ws)], ' ')
                END) AS n_chars
  FROM w""")

# cyclic rotation by cp positions: norms preserved, directions changed
write("embeddings", f"""
  SELECT vec_id + cp * {K['embeddings']} AS vec_id,
         CASE WHEN cp = 0 THEN embedding
              ELSE (embedding[1 + cp:] || embedding[:cp])::FLOAT[]
         END AS embedding,
         label
  FROM {src('embeddings')}, {copies}""")

print("done ->", OUT)
