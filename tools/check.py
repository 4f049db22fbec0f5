#!/usr/bin/env python3
"""Dev-only pre-check mimicking the driver's correctness gate:
run graft.Verify at a given SF, then replay oracle_sql.json in DuckDB over
the same parquet tables and compare sorted results per query.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]
"""
import json, sys, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
            duck_df = con.sql(sql).df()
            # driver compare: sort columns by name, sort rows, hash values
            sc = spark_df[sorted(spark_df.columns)]
            dc = duck_df[sorted(duck_df.columns)]
            if list(sc.columns) != list(dc.columns):
                print(f"FAIL {name}: columns {list(sc.columns)} vs {list(dc.columns)}")
                fail += 1
                continue
            key = lambda t: tuple((v is None, str(type(v)), str(v)) for v in t)
            svals = sorted((tuple(norm_cell(x) for x in r) for r in sc.itertuples(index=False)), key=key)
            dvals = sorted((tuple(norm_cell(x) for x in r) for r in dc.itertuples(index=False)), key=key)
            if len(svals) != len(dvals):
                print(f"FAIL {name}: rows {len(svals)} vs {len(dvals)}")
                fail += 1
                continue
            diffs = [(a, b) for a, b in zip(svals, dvals) if a != b]
            if diffs:
                print(f"FAIL {name}: {len(diffs)} row diffs; first: {diffs[0][0]} vs {diffs[0][1]}")
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
