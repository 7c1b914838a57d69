#!/usr/bin/env python3
"""Local dev cross-check mimicking the driver's correctness gate:
runs each oracle_sql.json query in DuckDB over the sf tables, loads the
Spark result parquet, sorts columns by name, and compares row-for-row.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
       python3 tools/check.py --bench <bench_details.json> [gate] \
           [--vs <other_bench_details.json>]

--bench reads a bench_details artifact and reports the per-query RAW
(spark/oracle) and FLOORED ratios side by side. The floored denominator
is max(oracle, job_floor x jobs): a query needing J Spark jobs can
never beat J scheduling floors, so DuckDB's sub-millisecond in-process
denominators read as structural >2x raw while the floored column shows
what the ENGINE costs above pure job scheduling. The 2x gate (override
with [gate]) is evaluated both ways; exit is always 0 — this is a
review aid, the driver's gate is batch_vs_oracle on the compact line.

HOST NORMALIZATION: the artifact's `cpu_ref` (a fixed single-thread
spin, min over sweeps) is divided by the PINNED reference CPU_REF_PIN
(see BENCH_NOTES.md) to estimate the host-speed factor of the run; the
report prints the aggregate ratio normalized by that factor. With
--vs OTHER, two artifacts are compared and the ratio delta is
decomposed: how much of it the cpu_ref drift explains vs what survives
normalization (only the survivor is worth a per-query hunt).
"""
import json, sys, glob

# The pinned host-speed reference for cpu_ref normalization: the
# round-14..16 observed band was 0.469-0.541 s (BENCH_NOTES.md's
# four-run table); 0.50 is its center. cpu_ref/PIN ~ how much slower
# this run's host was than the pinned baseline.
CPU_REF_PIN = 0.50


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def _bench_rows(path):
    """(rows, streaming, floor, cpu_ref): rows = (query, spark, oracle,
    jobs, raw_ratio, floored_ratio)."""
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
    return rows, streaming, floor, d.get("cpu_ref")


def bench_report(path, gate=2.0, vs=None):
    rows, streaming, floor, cpu = _bench_rows(path)
    host = cpu / CPU_REF_PIN if cpu else None
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
    if host:
        print(f"host: cpu_ref={cpu:.3f}s vs pinned {CPU_REF_PIN:.3f}s -> "
              f"{host:.2f}x pin; host-normalized aggregate: "
              f"raw={tot_s/tot_o/host:.3f} floored={tot_s/tot_f/host:.3f}")
    else:
        print("host: no cpu_ref in artifact (pre-round-16) — "
              "normalization unavailable")
    print(f">{gate}x raw: {len(over_raw)}/{len(batch)}; >{gate}x floored: "
          f"{len(over_fl)}/{len(batch)} {sorted(over_fl)}")
    if vs:
        bench_compare(path, vs)


def bench_compare(path_a, path_b):
    """Round-over-round drift attribution: decompose the aggregate
    raw-ratio delta (COMMON batch queries only, so new rows never read
    as drift) into what the cpu_ref host-speed drift explains and what
    survives normalization — only the survivor is engine change."""
    rows_a, streaming_a, _, cpu_a = _bench_rows(path_a)
    rows_b, streaming_b, _, cpu_b = _bench_rows(path_b)
    common = ({r[0] for r in rows_a} & {r[0] for r in rows_b}) \
        - streaming_a - streaming_b
    a = {r[0]: r for r in rows_a if r[0] in common}
    b = {r[0]: r for r in rows_b if r[0] in common}
    if not common:
        print(f"\n--vs {path_b}: no common batch queries — "
              "comparison unavailable")
        return
    oa, ob = sum(v[2] for v in a.values()), sum(v[2] for v in b.values())
    if oa == 0 or ob == 0:
        print(f"\n--vs {path_b}: zero oracle time over the "
              f"{len(common)}-query common set — comparison unavailable")
        return
    ra = sum(v[1] for v in a.values()) / oa
    rb = sum(v[1] for v in b.values()) / ob
    print(f"\n--vs {path_b} ({len(common)} common batch queries)")
    print(f"aggregate raw: this={ra:.3f} other={rb:.3f} delta={ra-rb:+.3f}")
    if not (cpu_a and cpu_b):
        print("one artifact lacks cpu_ref — attribution unavailable")
        return
    na, nb = ra / (cpu_a / CPU_REF_PIN), rb / (cpu_b / CPU_REF_PIN)
    print(f"cpu_ref: this={cpu_a:.3f}s other={cpu_b:.3f}s "
          f"(host {cpu_a / cpu_b:.2f}x other)")
    print(f"host-normalized raw: this={na:.3f} other={nb:.3f} "
          f"delta={na-nb:+.3f}")
    if abs(ra - rb) > 1e-9:
        pct = max(0.0, min(100.0, (1 - abs(na - nb) / abs(ra - rb)) * 100))
        print(f"verdict: host-drift explains ~{pct:.0f}% of the delta; "
              f"{abs(na-nb):.3f} survives normalization"
              + (" — worth a per-query hunt" if abs(na - nb) > 0.05
                 else " — inside the noise band, no hunt warranted"))
    else:
        print("verdict: no delta to attribute")


def main():
    if sys.argv[1] == "--bench":
        args = sys.argv[2:]
        vs = None
        if "--vs" in args:
            i = args.index("--vs")
            vs = args[i + 1]
            args = args[:i] + args[i + 2:]
        bench_report(args[0], float(args[1]) if len(args) > 1 else 2.0, vs=vs)
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
