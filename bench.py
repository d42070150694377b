"""Benchmark harness — BASELINE.json workloads on real hardware.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: two-table equi-join throughput at the reference's own shape —
100M x 100M rows with NON-UNIQUE keys (BASELINE config 3; reference claim
62.5M rows/s on GPU, README.md:325 — rows counted as left+right like the
reference).  Details for all configs go to stderr and bench_results.json,
including the achieved effective scan bandwidth and its fraction of the
per-chip HBM roofline (BASELINE >=80% target).

Usage:  python bench.py [--quick] [--config N] [--rows N] [--xl]
        --xl adds the 1B-row out-of-core streamed GROUP BY (reference
        README.md:332-334 workload; needs ~20 GB disk for the parquet).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINES = {
    # reference-published GPU numbers (BASELINE.md)
    "join": 62.5e6,          # rows/s, inner join 100Mx100M (l+r rows / time)
    "join_lookup": 62.5e6,   # rows/s, asymmetric unique-build lookup shape
    "groupby": 526e6,        # rows/s, GROUP BY (reference: 1B rows)
    "groupby_1b": 526e6,     # rows/s, the literal 1B-row streamed workload
    "filter_agg": 526e6,     # closest published analogue
    "sortmerge": 48.8e6,     # rows/s sort-merge join
}


def _engine(batch_rows: int, join_expansion: float = 1.25):
    from gpu_olap_tpu import EngineConfig, OlapEngine

    cfg = EngineConfig(
        backend="device",
        join_expansion=join_expansion,
        max_groups=1 << 23,
        min_shape_bucket=1 << 16,
        enable_cache=False,  # measure execution, not the result cache
    )
    return OlapEngine(cfg)


def _time_query(eng, sql: str, iters: int = 3):
    from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS

    eng.query(sql)  # warm: compile + device upload
    best = float("inf")
    best_exec = float("inf")
    bytes_exec = 0
    for _ in range(iters):
        st = GLOBAL_METRICS.ops.get("device_execute")
        s0 = st.seconds if st else 0.0
        b0 = st.bytes_accessed if st else 0
        t0 = time.perf_counter()
        r = eng.query(sql)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        st = GLOBAL_METRICS.ops.get("device_execute")
        if st is not None and st.seconds > s0:
            # device-program wall time, sans host parse/plan + result pull
            best_exec = min(best_exec, st.seconds - s0)
            bytes_exec = st.bytes_accessed - b0
    return best, r, (best_exec if best_exec < float("inf") else None), bytes_exec


def _roofline(res: dict):
    """Effective scan bandwidth of the device program: table input bytes
    (each input byte counted ONCE) / device-program wall seconds, as a
    fraction of the per-chip HBM roofline.  Multi-pass operators touch HBM
    more than once, so this is a conservative lower bound on achieved BW."""
    from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS

    ex = res.get("exec_seconds")
    by = res.get("exec_bytes", 0)
    if ex and by:
        gbps = by / ex / 1e9
        res["scan_gbps"] = round(gbps, 2)
        res["scan_roofline_frac"] = round(
            by / ex / GLOBAL_METRICS.hbm_bandwidth, 4)
    return res


def bench_filter_agg(n_rows: int, iters: int):
    """Config 1: scan + filter (x > c) + COUNT/SUM on int64."""
    eng = _engine(n_rows)
    rng = np.random.default_rng(0)
    eng.register("t", {
        "k": rng.integers(0, 1 << 20, n_rows).astype(np.int64),
        "v": rng.integers(0, 1000, n_rows).astype(np.int64),
    })
    sql = "SELECT COUNT(*) AS n, SUM(v) AS s FROM t WHERE v > 500"
    dt, r, ex, by = _time_query(eng, sql, iters)
    from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS

    return _roofline({"seconds": dt, "exec_seconds": ex, "exec_bytes": by,
                      "rows": n_rows, "rows_per_sec": n_rows / dt,
                      "result_rows": r.num_rows,
                      "pallas_fused": GLOBAL_METRICS.counters.get(
                          "pallas_filter_agg_trace", 0) > 0})


def bench_groupby(n_rows: int, n_groups: int, iters: int):
    """Config 2: high-cardinality GROUP BY SUM/MIN/MAX."""
    eng = _engine(n_rows)
    rng = np.random.default_rng(1)
    eng.register("t", {
        "k": rng.integers(0, n_groups, n_rows).astype(np.int64),
        "v": rng.integers(0, 1_000_000, n_rows).astype(np.int64),
    })
    sql = "SELECT k, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx FROM t GROUP BY k"
    dt, r, ex, by = _time_query(eng, sql, iters)
    return _roofline({"seconds": dt, "exec_seconds": ex, "exec_bytes": by,
                      "rows": n_rows, "rows_per_sec": n_rows / dt,
                      "groups": r.num_rows})


def bench_groupby_1b(n_rows: int, n_groups: int, iters: int):
    """The reference's literal GROUP BY workload (README.md:332-334): 1B rows.

    Larger than HBM (1B x 2 int64 columns + sort buffers) — runs through the
    out-of-core streamed partial-aggregation path from a parquet file, so the
    measured rate is host->device-link-bound, not compute-bound.  The
    device-compute rate is reported separately by the 100M in-memory config.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.environ.get("GPU_OLAP_1B_PARQUET", "/tmp/gpu_olap_1b.parquet")
    if not os.path.exists(path):
        print(f"# writing {n_rows} rows to {path} ...", file=sys.stderr)
        rng = np.random.default_rng(42)
        chunk = 50_000_000
        writer = None
        for lo in range(0, n_rows, chunk):
            m = min(chunk, n_rows - lo)
            t = pa.table({
                "k": rng.integers(0, n_groups, m),
                "v": rng.integers(0, 1_000_000, m),
            })
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema)
            writer.write_table(t)
        writer.close()
    eng = _engine(1 << 26)
    # 8M-row streamed chunks: amortize the ~30 ms relay dispatch floor and
    # the per-chunk partial-aggregation program over 128 MB uploads
    eng.config.batch_size = 1 << 23
    eng.load_table("t", path)
    sql = "SELECT k, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx FROM t GROUP BY k"
    t0 = time.perf_counter()
    r = eng.query(sql)
    dt = time.perf_counter() - t0
    best = dt
    for _ in range(max(iters - 1, 0)):
        t0 = time.perf_counter()
        r = eng.query(sql)
        best = min(best, time.perf_counter() - t0)
    return {"seconds": best, "rows": n_rows, "rows_per_sec": n_rows / best,
            "groups": r.num_rows, "backend": r.meta.get("backend")}


def bench_join(n_left: int, n_right: int, iters: int):
    """Config 3 HONEST shape: 100M x 100M, NON-UNIQUE keys on both sides
    (key space = n_right / 2, ~2 duplicates per build key) — defeats the
    unique-build lookup fast path, so the general merge-probe (radix-hash
    analogue) executes.  Rows/s counts l+r like the reference README.md:325."""
    eng = _engine(max(n_left, n_right), join_expansion=2.6)
    rng = np.random.default_rng(2)
    nkeys = max(n_right // 2, 1)
    eng.register("l", {"k": rng.integers(0, nkeys, n_left).astype(np.int64)})
    eng.register("r", {"k": rng.integers(0, nkeys, n_right).astype(np.int64)})
    # SUM over BOTH sides forces true pair materialization (the group-join
    # rewrite only covers probe-side arguments); summing the keys themselves
    # keeps the two 100M-row tables single-column so the ~2x-expansion match
    # buffers + sort ping-pongs fit HBM at the reference's full shape
    sql = "SELECT COUNT(*) AS n, SUM(l.k + r.k) AS s FROM l JOIN r ON l.k = r.k"
    dt, r, ex, by = _time_query(eng, sql, iters)
    total_rows = n_left + n_right
    return _roofline({"seconds": dt, "exec_seconds": ex, "exec_bytes": by,
                      "rows": total_rows, "rows_per_sec": total_rows / dt,
                      "matches": int(r.to_pydict()["n"][0])})


def bench_join_lookup(n_left: int, n_right: int, iters: int):
    """Asymmetric unique-build shape (persistent dense-index lookup join):
    kept alongside the honest config to track the fast path."""
    eng = _engine(max(n_left, n_right))
    rng = np.random.default_rng(2)
    lk = rng.integers(0, n_right, n_left).astype(np.int64)
    eng.register("l", {"k": lk, "v": rng.integers(0, 1000, n_left).astype(np.int64)})
    eng.register("r", {"k": np.arange(n_right, dtype=np.int64),
                       "w": rng.integers(0, 1000, n_right).astype(np.int64)})
    sql = "SELECT COUNT(*) AS n, SUM(l.v + r.w) AS s FROM l JOIN r ON l.k = r.k"
    dt, r, ex, by = _time_query(eng, sql, iters)
    total_rows = n_left + n_right
    return _roofline({"seconds": dt, "exec_seconds": ex, "exec_bytes": by,
                      "rows": total_rows, "rows_per_sec": total_rows / dt,
                      "matches": int(r.to_pydict()["n"][0])})


def bench_sortmerge(n_left: int, n_right: int, iters: int):
    """Config 4: duplicate-heavy keys (stress the merge/expansion path)."""
    eng = _engine(max(n_left, n_right), join_expansion=2.5)
    rng = np.random.default_rng(3)
    # ~4 duplicates per build key (match count ~= 4x probe rows)
    nkeys = max(n_right // 4, 1)
    eng.register("l", {"k": rng.integers(0, nkeys, n_left).astype(np.int64)})
    eng.register("r", {"k": rng.integers(0, nkeys, n_right).astype(np.int64)})
    sql = "SELECT COUNT(*) AS n FROM l JOIN r ON l.k = r.k"
    dt, r, ex, by = _time_query(eng, sql, iters)
    total_rows = n_left + n_right
    return _roofline({"seconds": dt, "exec_seconds": ex, "exec_bytes": by,
                      "rows": total_rows, "rows_per_sec": total_rows / dt,
                      "matches": int(r.to_pydict()["n"][0])})


def bench_micro(iters: int = 2000):
    """Frontend micro-benchmarks — parse/optimize parity with the reference's
    criterion benches (benches/engine_bench.rs:8-43)."""
    from gpu_olap_tpu.plan.optimizer import optimize
    from gpu_olap_tpu.sql.parser import parse_sql

    simple = "SELECT a, b, c FROM sales WHERE revenue > 1000"
    complex_join = ("SELECT o.id, c.name, sum(o.amount) FROM orders o "
                    "JOIN customers c ON o.cust_id = c.id "
                    "WHERE o.amount > 100 GROUP BY o.id, c.name "
                    "ORDER BY o.id LIMIT 50")
    out = {}
    for name, sql in [("parse_simple_select", simple),
                      ("parse_complex_join", complex_join)]:
        t0 = time.perf_counter()
        for _ in range(iters):
            parse_sql(sql)
        out[name] = (time.perf_counter() - t0) / iters * 1e6  # us
    plan = parse_sql("SELECT a FROM t WHERE a > 10")
    t0 = time.perf_counter()
    for _ in range(iters):
        optimize(plan)
    out["optimize_simple"] = (time.perf_counter() - t0) / iters * 1e6
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes (smoke)")
    ap.add_argument("--micro", action="store_true",
                    help="parse/optimize micro-benches only (engine_bench.rs)")
    ap.add_argument("--xl", action="store_true",
                    help="also run the 1B-row streamed GROUP BY workload")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale factor on row counts")
    ap.add_argument("--budget", type=float, default=5400.0,
                    help="soft time budget (seconds); later configs skipped")
    args = ap.parse_args()

    if args.micro:
        micro = bench_micro()
        for k, v in micro.items():
            print(f"# {k}: {v:.1f} us", file=sys.stderr)
        print(json.dumps({"metric": "parse_simple_select_us",
                          "value": round(micro["parse_simple_select"], 2),
                          "unit": "us", "vs_baseline": 1.0}))
        return

    if args.quick:
        sizes = {"filter_agg": 1 << 20, "groupby": (1 << 20, 1 << 14),
                 "join": (1 << 20, 1 << 20), "join_lookup": (1 << 20, 1 << 17),
                 "sortmerge": (1 << 19, 1 << 17),
                 "groupby_1b": (1 << 22, 1 << 14)}
    else:
        s = args.scale
        sizes = {
            "filter_agg": int(200e6 * s),
            "groupby": (int(100e6 * s), int(4e6 * s)),
            "join": (int(100e6 * s), int(100e6 * s)),
            "join_lookup": (int(100e6 * s), int(10e6 * s)),
            "sortmerge": (int(25e6 * s), int(25e6 * s)),
            "groupby_1b": (int(1e9 * s), int(4e6 * s)),
        }

    results = {}
    t0 = time.time()
    # join first: it is the headline metric; remaining configs run within the
    # time budget (remote TPU compiles can take many minutes each)
    plan = [
        ("join", lambda: bench_join(*sizes["join"], args.iters)),
        ("groupby", lambda: bench_groupby(*sizes["groupby"], args.iters)),
        ("filter_agg", lambda: bench_filter_agg(sizes["filter_agg"], args.iters)),
        ("sortmerge", lambda: bench_sortmerge(*sizes["sortmerge"], args.iters)),
        ("join_lookup", lambda: bench_join_lookup(*sizes["join_lookup"], args.iters)),
    ]
    if args.xl:
        plan.append(("groupby_1b",
                     lambda: bench_groupby_1b(*sizes["groupby_1b"], 1)))
    for name, fn in plan:
        if results and time.time() - t0 > args.budget:
            print(f"# skipping {name}: over time budget", file=sys.stderr)
            continue
        try:
            results[name] = fn()
            print(f"# {name}: {results[name]}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — partial results still reported
            print(f"# {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    for name, res in results.items():
        res["vs_baseline"] = res["rows_per_sec"] / BASELINES[name]

    try:
        import jax

        device = str(jax.devices()[0])
    except Exception:
        device = "unknown"
    from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS

    payload = {"device": device, "total_seconds": time.time() - t0,
               "hbm_roofline_bytes_per_sec": GLOBAL_METRICS.hbm_bandwidth,
               "results": results, "op_metrics": GLOBAL_METRICS.summary()}
    with open("bench_results.json", "w") as f:
        json.dump(payload, f, indent=2, default=str)
    print(f"# full results -> bench_results.json ({device})", file=sys.stderr)

    for pick in ("join", "groupby", "filter_agg", "sortmerge", "join_lookup"):
        if pick in results:
            headline = results[pick]
            break
    else:
        print(json.dumps({"metric": "bench_failed", "value": 0.0,
                          "unit": "rows/s", "vs_baseline": 0.0}))
        return
    label = {"join": "inner_join_100Mx100M", "groupby": "groupby_100M_4Mgrp",
             "filter_agg": "filter_agg_200M", "sortmerge": "sortmerge_25Mx25M",
             "join_lookup": "inner_join_lookup_100Mx10M"}[pick]
    if args.quick:
        label += "_quick"
    print(json.dumps({
        "metric": f"{label}_rows_per_sec",
        "value": round(headline["rows_per_sec"], 1),
        "unit": "rows/s",
        "vs_baseline": round(headline["vs_baseline"], 4),
    }))


if __name__ == "__main__":
    main()
