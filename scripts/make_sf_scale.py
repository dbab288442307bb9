#!/usr/bin/env python3
"""Deterministic sfN rehearsal data: scale /root/testdata/sf0.1 by an
integer factor for the round-15 scaling-curve measurement (VERDICT r14,
"Next round" #1). NOT driver data — a self-generated rehearsal set that
mirrors sf0.1's schema and distributions so per-query sf1/sf0.1 wall-time
ratios are meaningful.

Construction: K shifted copies of every sf0.1 row (K = --factor).
  - ids shift by copy * (max_id + 1): group cardinalities, join fan-outs
    and id-keyed RNG chains keep their shape while rows grow Kx;
  - document text gains one copy-salted token so the gram vocabulary
    grows with the corpus instead of collapsing to 10x exact duplicates
    (which would make every dedup query degenerate);
  - embeddings perturb one coordinate per copy by copy * 1e-3 so copies
    are near- but not exact duplicates (the semdedup regime);
  - events/lineitem keep their timestamp range (same panel length,
    Kx rows per day — the densification regime, not a longer history).

Output is written with 50k-row parquet row groups — at-scale inputs are
many-row-group files, and the single-row-group layout of the driver's
testdata is exactly what the r15 fan-out work routes around.

Usage: python3 scripts/make_sf_scale.py [--factor 10] [--out /tmp/sf1]
"""
import argparse
import duckdb

ap = argparse.ArgumentParser()
ap.add_argument("--factor", type=int, default=10)
ap.add_argument("--src", default="/root/testdata/sf0.1")
ap.add_argument("--out", default="/tmp/sf1")
args = ap.parse_args()
K, SRC, OUT = args.factor, args.src, args.out

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO 8")

def write(name, sql):
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{name}.parquet' "
        f"(FORMAT PARQUET, ROW_GROUP_SIZE 50000)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")

write("documents", f"""
  SELECT d.doc_id + k.k * (SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet') AS doc_id,
         CASE WHEN k.k = 0 THEN d.text
              ELSE d.text || ' c' || k.k || 'w' || (d.doc_id % 97) END AS text,
         d.lang, d.source,
         CASE WHEN k.k = 0 THEN d.n_chars
              ELSE d.n_chars + length(' c' || k.k || 'w' || (d.doc_id % 97)) END AS n_chars
  FROM '{SRC}/documents.parquet' d, (SELECT unnest(range({K})) AS k) k
  ORDER BY doc_id""")

write("embeddings", f"""
  SELECT e.vec_id + k.k * (SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet') AS vec_id,
         list_transform(list_zip(e.embedding, range(len(e.embedding))),
           z -> CASE WHEN z[2] = k.k % len(e.embedding)
                     THEN z[1] + k.k * 0.001 ELSE z[1] END)::FLOAT[] AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e, (SELECT unnest(range({K})) AS k) k
  ORDER BY vec_id""")

write("events", f"""
  SELECT e.event_id + k.k * (SELECT max(event_id) + 1 FROM '{SRC}/events.parquet') AS event_id,
         e.ts, e.user_id + k.k * 1000 AS user_id, e.event_type,
         CASE WHEN k.k = 0 THEN e.value
              ELSE round(e.value + 0.01 * k.k, 2) END AS value,
         e.props
  FROM '{SRC}/events.parquet' e, (SELECT unnest(range({K})) AS k) k
  ORDER BY event_id""")

write("lineitem", f"""
  SELECT l.l_orderkey + k.k * (SELECT max(l_orderkey) + 1 FROM '{SRC}/lineitem.parquet') AS l_orderkey,
         l.l_partkey, l.l_suppkey, l.l_linenumber,
         l.l_quantity, l.l_extendedprice, l.l_discount, l.l_tax,
         l.l_returnflag, l.l_linestatus, l.l_shipdate
  FROM '{SRC}/lineitem.parquet' l, (SELECT unnest(range({K})) AS k) k
  ORDER BY l_orderkey, l_linenumber""")

print("done:", OUT)
