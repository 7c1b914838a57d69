#!/usr/bin/env python3
"""Local dev cross-check mimicking the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the sf tables, loads the
Spark result parquet, sorts columns by name, and compares row-for-row.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
       python3 tools/check.py --bench <bench_details.json> [gate]

--bench reads a bench_details artifact and reports the per-query RAW
(spark/oracle) and FLOORED ratios side by side. The floored denominator
is max(oracle, job_floor x jobs): a query needing J Spark jobs can
never beat J scheduling floors, so DuckDB's sub-millisecond in-process
denominators read as structural >2x raw while the floored column shows
what the ENGINE costs above pure job scheduling. The 2x gate (override
with [gate]) is evaluated both ways; exit is always 0 — this is a
review aid, the driver's gate is batch_vs_oracle on the compact line.
"""
import json, sys, glob


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def bench_report(path, gate=2.0):
    d = json.load(open(path))
    q, o = d.get("queries", {}), d.get("oracle_queries", {})
    jobs, floor = d.get("query_jobs", {}), d.get("job_floor", 0.0)
    streaming = {k for k in q if "streaming" in k}
    rows = []
    for k in sorted(q):
        if k not in o or o[k] <= 0 or "#" in k:
            continue
        raw = q[k] / o[k]
        fd = max(o[k], floor * jobs.get(k, 0.0))
        rows.append((k, q[k], o[k], jobs.get(k, 0.0), raw, q[k] / fd))
    hdr = f"{'query':42} {'spark':>7} {'oracle':>7} {'jobs':>5} {'raw':>7} {'floored':>7}"
    print(hdr + "\n" + "-" * len(hdr))
    for k, s, ov, j, raw, fl in sorted(rows, key=lambda r: -r[5]):
        tag = " [streaming]" if k in streaming else ""
        print(f"{k:42} {s:7.3f} {ov:7.3f} {j:5.0f} {raw:7.2f} {fl:7.2f}{tag}")
    batch = [r for r in rows if r[0] not in streaming]
    tot_s, tot_o = sum(r[1] for r in batch), sum(r[2] for r in batch)
    tot_f = sum(max(r[2], floor * r[3]) for r in batch)
    over_raw = [r[0] for r in batch if r[4] > gate]
    over_fl = [r[0] for r in batch if r[5] > gate]
    print(f"\nbatch: spark={tot_s:.3f}s oracle={tot_o:.3f}s floor={floor*1000:.1f}ms/job")
    print(f"aggregate ratio: raw={tot_s/tot_o:.3f} floored={tot_s/tot_f:.3f}")
    print(f">{gate}x raw: {len(over_raw)}/{len(batch)}; >{gate}x floored: "
          f"{len(over_fl)}/{len(batch)} {sorted(over_fl)}")


def main():
    if sys.argv[1] == "--bench":
        bench_report(sys.argv[2],
                     float(sys.argv[3]) if len(sys.argv) > 3 else 2.0)
        return
    import duckdb
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
