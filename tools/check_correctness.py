#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfdir> <outdir>
  1. expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have run
  2. registers the sfdir parquet tables in DuckDB
  3. runs each oracle_sql.json entry and compares with <outdir>/<name> parquet
Comparison: column names sorted, rows sorted, values stringified, AND
DuckDB result types compared per column — the driver's hash is
type-sensitive (e.g. DuckDB sum(BIGINT) -> HUGEINT vs Spark BIGINT
hash-mismatches even when values agree), so a stringified-only compare
is weaker than the real gate.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    try:
        run_errors = json.load(open(f"{outdir}/errors.json"))
    except Exception:
        run_errors = {}
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        if name in run_errors:
            bad.append((name, f"spark query errored: {run_errors[name]}"))
            continue
        try:
            o = con.sql(sql)
            o_cols = [c.lower() for c in o.columns]
            o_types = [str(t) for t in o.types]
            o_rows = o.fetchall()
        except Exception as e:
            bad.append((name, f"oracle SQL error: {str(e)[:200]}"))
            continue
        try:
            s = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            s_cols = [c.lower() for c in s.columns]
            s_types = [str(t) for t in s.types]
            s_rows = s.fetchall()
        except Exception as e:
            bad.append((name, f"spark result missing: {str(e)[:200]}"))
            continue
        if sorted(o_cols) != sorted(s_cols):
            bad.append((name, f"schema mismatch: oracle={sorted(o_cols)} spark={sorted(s_cols)}"))
            continue
        # The driver tolerates integer-width differences (int32 and int64
        # hash identically through Python ints) but NOT HUGEINT, which falls
        # outside int64 — so normalize widths, keep HUGEINT distinct.
        def norm_type(t):
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "INT"
            if t in ("FLOAT", "REAL", "DOUBLE"):  # float32/float64 hash alike too
                return "FLOAT"
            return t
        o_typed = sorted(zip(o_cols, (norm_type(t) for t in o_types)))
        s_typed = sorted(zip(s_cols, (norm_type(t) for t in s_types)))
        if o_typed != s_typed:
            mism = [(a, b) for a, b in zip(o_typed, s_typed) if a != b]
            bad.append((name, f"type mismatch (driver hash is type-sensitive): oracle vs spark {mism}"))
            continue
        if len(o_rows) != len(s_rows):
            bad.append((name, f"row count: oracle={len(o_rows)} spark={len(s_rows)}"))
            continue
        ko = table_key(o_rows, o_cols)
        ks = table_key(s_rows, s_cols)
        if ko != ks:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(ko, ks)) if a != b)
            bad.append((name, f"value mismatch at sorted-row {diff[0]}:\n  oracle={diff[1]}\n  spark ={diff[2]}\n  cols(sorted)={sorted(o_cols)}"))
            continue
        ok.append((name, len(s_rows)))
    for name, n in ok:
        print(f"PASS {name} ({n} rows)")
    for name, msg in bad:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(ok)} pass / {len(bad)} fail / {len(oracle)} total")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
