#!/usr/bin/env python3
"""Times each oracle SQL in DuckDB over the sf tables (min of N runs) and
prints ONE JSON line {query_name: seconds}. Invoked by graft.Bench so the
bench artifact carries its own oracle denominator — the driver's 2x gate
compares Spark wall seconds against DuckDB on the same host, so a recorded
number without the denominator is uninterpretable when the host is noisy.

Usage: python3 tools/oracle_bench.py <sfDir> <oracle_sql.json> [runs]
"""
import glob
import json
import sys
import time

import duckdb


def main():
    sf_dir, sql_json = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(sql_json))
    out = {}
    for name, sql in sorted(oracle.items()):
        try:
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 4)
        except Exception as e:  # a broken oracle is the driver's finding, not ours
            print(f"oracle_bench: {name} failed: {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
