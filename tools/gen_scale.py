#!/usr/bin/env python3
"""Dev-only scale-rehearsal fixture generator (round-4 VERDICT item 5).

Scales the driver's sf0.1 parquet tables by FACTOR via key-offset
replication: copy i shifts every join key by i*OFFSET, so join fan-outs
and group cardinalities grow linearly, matching a genuine TPC-H scale-up.
Document text gets a per-copy token prefix so cross-copy documents share
no shingles: the dup-cluster density (the thing that drives LSH bucket
occupancy) stays at its sf0.1 level instead of growing quadratically from
artificial cross-copy duplicates — the measured exponent is then the
ALGORITHM's, not the fixture's.

Output is a rehearsal artifact only (correctness still gates on the
driver's own testdata). Usage: python3 tools/gen_scale.py [factor] [out]
"""
import sys

import duckdb

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1gen"
SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def gen(table, key_cols, text_col=None):
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    sel = []
    for c in cols:
        if c in key_cols:
            sel.append(f"({c} + i * {OFF}) AS {c}")
        elif c == text_col:
            sel.append(
                rf"regexp_replace({c}, '(\S+)', 'c' || i || '_\1', 'g') AS {c}")
        else:
            sel.append(c)
    q = (f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet', "
         f"range({FACTOR}) t(i)) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# tiny dims pass through unscaled (they are fixed-size in TPC-H too)
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

gen("customer", {"c_custkey"})
gen("supplier", {"s_suppkey"})
gen("part", {"p_partkey"})
gen("orders", {"o_orderkey", "o_custkey"})
gen("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"})
gen("documents", {"doc_id"}, text_col="text")
gen("embeddings", {"vec_id"})
con.execute(f"""COPY (SELECT * REPLACE (user_id + i * {OFF} AS user_id,
    event_id + i * {OFF} AS event_id)
  FROM '{SRC}/events.parquet', range({FACTOR}) t(i))
  TO '{OUT}/events.parquet' (FORMAT PARQUET)""")
print("events: done")
