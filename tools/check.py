#!/usr/bin/env python3
"""Dev-only pre-check mimicking the driver's correctness gate:
run graft.Verify at a given SF, then replay oracle_sql.json in DuckDB over
the same parquet tables and compare sorted TYPED results per query.

Critical (round-1 lesson): the Spark side must be read via pyarrow so parquet
DECIMAL comes back as decimal.Decimal, and the DuckDB side via its native
fetchall() so DECIMAL/HUGEINT keep their types. Reading both sides through
duckdb .df() coerces everything to float64 and masks exactly the type
mismatches the driver's hash catches (13 false-green queries in round 1).

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import datetime
import decimal
import glob
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Normalize a typed cell to (type_tag, value) — equal only when both the
    logical type family AND the value agree, like the driver's typed hash."""
    if v is None:
        return ("null", None)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, decimal.Decimal):
        return ("decimal", str(v))
    if isinstance(v, datetime.datetime):
        return ("timestamp", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(norm_cell(x) for x in v))
    if isinstance(v, bytes):
        return ("bytes", v)
    return (type(v).__name__, str(v))


def spark_rows(name):
    """Read Spark's parquet output via pyarrow, preserving logical types."""
    files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {OUT}/{name}")
    tbl = pq.read_table(files)
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    return cols, [tuple(row[c] for c in cols) for row in tbl.to_pylist()]


def duck_rows(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r[i] for i in order) for r in cur.fetchall()]
    return sorted(c for c in cols), rows


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            s_cols, s_raw = spark_rows(name)
            d_cols, d_raw = duck_rows(con, sql)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
                fail += 1
                continue
            svals = sorted((tuple(norm_cell(x) for x in r) for r in s_raw))
            dvals = sorted((tuple(norm_cell(x) for x in r) for r in d_raw))
            if len(svals) != len(dvals):
                print(f"FAIL {name}: rows {len(svals)} vs {len(dvals)}")
                fail += 1
                continue
            diffs = [(a, b) for a, b in zip(svals, dvals) if a != b]
            if diffs:
                print(f"FAIL {name}: {len(diffs)} row diffs; "
                      f"first: {diffs[0][0]} vs {diffs[0][1]}")
                fail += 1
            else:
                print(f"OK   {name} ({len(svals)} rows)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
