#!/usr/bin/env python3
"""Local dev cross-check mimicking the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the sf tables, loads the
Spark result parquet, sorts columns by name, and compares row-for-row.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob
import duckdb


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            odf = con.sql(sql).df()
            sdf = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            ocols, scols = sorted(odf.columns), sorted(sdf.columns)
            if ocols != scols:
                print(f"FAIL {name}: cols oracle={ocols} spark={scols}")
                n_fail += 1
                continue
            # dtype compatibility: the driver hashes string reprs, so an
            # oracle float64 against a Spark int64 (e.g. DuckDB HUGEINT
            # from a windowed SUM materialized by pandas as float) hashes
            # "1.0" vs "1" even when the values compare equal in Python.
            kind = lambda d: "num_f" if d.kind == "f" else (
                "num_i" if d.kind in "iu" else d.kind)
            bad_dt = [(c, odf[c].dtype, sdf[c].dtype) for c in ocols
                      if {kind(odf[c].dtype), kind(sdf[c].dtype)} == {"num_f", "num_i"}]
            if bad_dt:
                c, od, sd = bad_dt[0]
                print(f"FAIL {name}: dtype slip on {c!r}: oracle={od} spark={sd}"
                      f" (driver hashes '1.0' != '1'; CAST the oracle column)")
                n_fail += 1
                continue
            # sort rows: tie groups under a non-total ORDER BY may legally
            # differ in order between engines (driver hashes sorted values)
            key = lambda t: tuple((v is None, str(v)) for v in t)
            orows = sorted((tuple(norm(v) for v in r) for r in odf[ocols].itertuples(index=False)), key=key)
            srows = sorted((tuple(norm(v) for v in r) for r in sdf[ocols].itertuples(index=False)), key=key)
            if len(orows) != len(srows):
                print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
                n_fail += 1
                continue
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
            if bad:
                i, a, b = bad[0]
                print(f"FAIL {name}: {len(bad)} differing rows; first at {i}:\n  oracle={a}\n  spark ={b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(orows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
