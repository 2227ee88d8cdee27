#!/usr/bin/env python3
"""Build a 10x scaled copy of an sf dir for the scale sweep (BENCHNOTES.md).

Usage: python3 tools/scale10.py [srcDir] [dstDir] [copies]

Ten key-shifted copies of every SF-scaling table, each a disjoint
sub-database sharing nation/region — join fan-outs, selectivities and
per-key group sizes stay constant while row counts scale 10x, which is
what a quadratic-cliff hunt needs. Key offsets are the next power of 10
above the source max, so shifted domains never collide.

Text handling: copy 0 keeps the ORIGINAL text; copies 1..9 suffix every
token with the copy id. Within-copy shingle/minhash structure is
preserved exactly (same dup clusters, same frequencies), cross-copy
similarity drops to zero — the dup RATE stays constant as the corpus
grows, like a real crawl, instead of every doc gaining 9 twins.
Embeddings keep their float values (vec_id shifted only): cross-copy
exact-duplicate vectors remain, so pair-producing embedding queries
carry a documented x10-pairs-per-bucket data artifact.

Dev tool only — NOT part of the library (the library is pure Scala/Spark).
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "target/sf1_scaled"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def off(table, col):
    m = con.sql(f"SELECT max({col}) FROM '{src}/{table}.parquet'").fetchone()[0]
    p = 1
    while p <= m:
        p *= 10
    return p


OFF = {
    "c_custkey": off("customer", "c_custkey"),
    "s_suppkey": off("supplier", "s_suppkey"),
    "p_partkey": off("part", "p_partkey"),
    "o_orderkey": off("orders", "o_orderkey"),
    "event_id": off("events", "event_id"),
    "user_id": off("events", "user_id"),
    "doc_id": off("documents", "doc_id"),
    "vec_id": off("embeddings", "vec_id"),
}
# foreign keys shift by their referenced table's offset
ALIAS = {"o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
         "l_partkey": "p_partkey", "l_suppkey": "s_suppkey"}

for t in ("nation", "region"):
    con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied as-is")

# events goes through pyarrow: its ts is parquet TIMESTAMP(NANOS), which
# DuckDB's writer silently downcasts to micros — Spark would then read
# TIMESTAMP_NTZ and every unix_micros()-based event query fails. pyarrow
# round-trips timestamp[ns] bit-exactly (needs parquet format >= 2.6).
import pyarrow as pa
import pyarrow.parquet as pq

ev = pq.read_table(f"{src}/events.parquet")
parts = []
for i in range(copies):
    t = ev
    for c, key in (("event_id", "event_id"), ("user_id", "user_id")):
        import pyarrow.compute as pc
        t = t.set_column(t.schema.get_field_index(c), c,
                         pc.add(t.column(c), i * OFF[key]))
    parts.append(t)
# row_group_size matches the DuckDB writer this path replaced: without
# it pyarrow writes ~1Mi-row groups, i.e. ONE row group for the whole
# scaled table — an unsplittable scan that bakes the split-starvation
# pathology into the fixture itself (BENCHNOTES.md)
pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet",
               version="2.6", coerce_timestamps=None, row_group_size=122880)
print("events", sum(p.num_rows for p in parts), "rows (pyarrow, ns preserved)")

for t in ("customer", "supplier", "part", "orders", "lineitem",
          "documents", "embeddings"):
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
    selects = []
    for i in range(copies):
        sel = []
        for c in cols:
            key = c if c in OFF else ALIAS.get(c)
            if key is not None:
                sel.append(f"{c} + {i * OFF[key]} AS {c}")
            elif t == "documents" and c == "text" and i > 0:
                sel.append("array_to_string(list_transform(string_split(trim(text), ' '), "
                           f"x -> x || '_{i}'), ' ') AS text")
            else:
                sel.append(c)
        selects.append(f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'")
    union = "\nUNION ALL\n".join(selects)
    con.sql(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(t, n, "rows")
print("done ->", dst)
