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


def pa_family(t):
    """pyarrow DataType -> type-family tag, matching the driver's typed
    hash: all machine ints (<=64 bit) are ONE family (q124/q125 have been
    driver-green for rounds with int32-vs-int64 columns), while int128
    (DuckDB HUGEINT) is a DIFFERENT family (round-9 q224 was driver-red
    on exactly that)."""
    s = str(t)
    if s.startswith("int") or (s.startswith("uint") and s != "uint64"):
        return "int"
    if s == "uint64":
        return "uint64"  # can exceed int64 — not the machine-int family
    if s in ("float", "halffloat"):
        return "float32"
    if s == "double":
        return "float64"
    if s.startswith("decimal"):
        return "decimal"
    if s in ("string", "large_string"):
        return "str"
    if s.startswith("date"):
        return "date"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "bool":
        return "bool"
    if "binary" in s:
        return "bytes"
    if s.startswith("list") or s.startswith("large_list"):
        # recurse: list<HUGEINT> vs array<bigint> is the same silent
        # width mismatch one nesting level down
        return f"list<{pa_family(t.value_type)}>"
    return s


DUCK_INTS = {"TINYINT": "int", "SMALLINT": "int", "INTEGER": "int",
             "BIGINT": "int", "HUGEINT": "int128", "UTINYINT": "int",
             "USMALLINT": "int", "UINTEGER": "int",
             "UBIGINT": "uint64", "UHUGEINT": "uint128"}


def duck_family(t):
    """DuckDB type string -> the same family tags as pa_family."""
    s = str(t).upper()
    if s in DUCK_INTS:
        return DUCK_INTS[s]
    if s == "FLOAT":
        return "float32"
    if s == "DOUBLE":
        return "float64"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "VARCHAR":
        return "str"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s == "BOOLEAN":
        return "bool"
    if s == "BLOB":
        return "bytes"
    if s.endswith("[]"):
        return f"list<{duck_family(s[:-2])}>"
    if s.startswith("LIST(") and s.endswith(")"):
        return f"list<{duck_family(s[5:-1])}>"
    return s


def type_mismatches(cols, s_fams, d_fams):
    """Column-aligned type-family diffs (the class the round-9 q224 red was:
    DuckDB sum(BIGINT) -> HUGEINT vs Spark int64 — values equal, widths not;
    Python ints erase the width so value comparison alone cannot catch it)."""
    return [f"{c}: spark={sf} duckdb={df}"
            for c, sf, df in zip(cols, s_fams, d_fams) if sf != df]

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
    fams = [pa_family(tbl.schema.field(c).type) for c in cols]
    return cols, fams, [tuple(row[c] for c in cols) for row in tbl.to_pylist()]


def duck_rows(con, sql):
    cur = con.sql(sql)
    cols = list(cur.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    fams = [duck_family(cur.types[i]) for i in order]
    rows = [tuple(r[i] for i in order) for r in cur.fetchall()]
    return sorted(c for c in cols), fams, rows


def selftest():
    """Seeded violation: a naked DuckDB sum(BIGINT) must be flagged as
    int128 vs a parquet int64, and the CAST-wrapped form must pass."""
    import pyarrow as pa
    import tempfile
    import os
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.parquet")
        pq.write_table(pa.table({"s": pa.array([3], type=pa.int64())}), p)
        s_fam = pa_family(pq.read_table(p).schema.field("s").type)
        naked = con.sql("SELECT sum(x) AS s FROM (SELECT 1::BIGINT AS x)")
        cast_ = con.sql(
            "SELECT CAST(sum(x) AS BIGINT) AS s FROM (SELECT 1::BIGINT AS x)")
        bad = type_mismatches(["s"], [s_fam], [duck_family(naked.types[0])])
        good = type_mismatches(["s"], [s_fam], [duck_family(cast_.types[0])])
        assert bad == ["s: spark=int duckdb=int128"], bad
        assert good == [], good
        # one nesting level down: [sum(x)] is HUGEINT[] vs array<bigint>
        pl = os.path.join(d, "l.parquet")
        pq.write_table(
            pa.table({"s": pa.array([[3]], type=pa.list_(pa.int64()))}), pl)
        l_fam = pa_family(pq.read_table(pl).schema.field("s").type)
        nakedl = con.sql(
            "SELECT [sum(x)] AS s FROM (SELECT 1::BIGINT AS x)")
        badl = type_mismatches(["s"], [l_fam],
                               [duck_family(nakedl.types[0])])
        assert badl == ["s: spark=list<int> duckdb=list<int128>"], badl
    print("selftest OK: naked sum(BIGINT) flagged int128 vs int64 (also "
          "inside list elements); CAST-wrapped form clean")


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            s_cols, s_fams, s_raw = spark_rows(name)
            d_cols, d_fams, d_raw = duck_rows(con, sql)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns {s_cols} vs {d_cols}")
                fail += 1
                continue
            tdiffs = type_mismatches(s_cols, s_fams, d_fams)
            if tdiffs:
                print(f"FAIL {name}: type families differ "
                      f"({'; '.join(tdiffs)})")
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
