"""Distributed scaling harness — BASELINE config 5 measurement structure.

Measures rows/s of the distributed shuffle join + group-by step at 1, 2, 4, N
mesh devices and reports scaling efficiency (target: >=70% at 2+ hosts).
On a single-chip/virtual-CPU environment the numbers characterize the harness,
not real ICI scaling; on a pod slice the same script measures the real thing
(run once per process with jax.distributed initialized).

Usage:
    python bench_dist.py [--rows-per-dev N] [--devices 1 2 4 8] [--zipf]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_dist.py          # virtual-mesh structural run
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_step(ndev: int, rows_per_dev: int, iters: int, zipf: bool):
    import jax

    from gpu_olap_tpu.parallel import dist_ops, mesh as mesh_mod, skew

    devices = jax.devices()
    if len(devices) < ndev:
        devices = jax.devices("cpu")
    if len(devices) < ndev:
        return None
    mesh = mesh_mod.make_mesh(ndev, devices=devices)
    sharding = mesh_mod.row_sharding(mesh)

    n = ndev * rows_per_dev
    rng = np.random.default_rng(0)
    n_keys = max(n // 16, 64)
    if zipf:
        raw = rng.zipf(1.2, n).astype(np.int64)
        lk = np.clip(raw, 1, n_keys) - 1
    else:
        lk = rng.integers(0, n_keys, n).astype(np.int64)
    rk = rng.integers(0, n_keys, n).astype(np.int64)
    lv = rng.integers(1, 100, n).astype(np.int64)
    rv = rng.integers(1, 100, n).astype(np.int64)

    # skew-aware shuffle capacity from the partition histogram
    import jax.numpy as jnp

    hist = np.asarray(skew.partition_histogram(jnp.asarray(lk), ndev))
    capacity = skew.recommend_capacity(hist, ndev, headroom=1.3)
    # expected matches/probe ~= n_right/n_keys = 16; 1.5x headroom.  (An
    # oversized buffer is pure waste: every downstream sort runs at the
    # buffer size, not the match count.)
    join_capacity = rows_per_dev * 24

    step = dist_ops.make_dist_join_groupby(
        mesh, capacity=capacity, join_capacity=join_capacity,
        max_groups=min(n_keys, 1 << 20), agg_funcs=("sum", "count"),
    )

    def shard(a):
        return jax.device_put(a, sharding)

    args_d = (shard(lk), shard(np.ones(n, bool)), shard(lv),
              shard(rk), shard(np.ones(n, bool)), shard(rv))
    out = step(*args_d)
    # an overflowed run drops rows and would report an optimistic rate — fail
    if bool(np.asarray(out[3])):
        raise RuntimeError(
            f"shuffle/join capacity overflow at ndev={ndev} "
            f"(capacity={capacity}, join_capacity={join_capacity})")
    np.asarray(out[0][:1])  # sync
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = step(*args_d)
        np.asarray(out[0][:1])
        best = min(best, time.perf_counter() - t0)
    total_rows = 2 * n
    return {"ndev": ndev, "rows": total_rows, "seconds": best,
            "rows_per_sec": total_rows / best,
            "shuffle_capacity": int(capacity)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-dev", type=int, default=1 << 20)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--zipf", action="store_true",
                    help="Zipfian probe keys (skewed-join config)")
    ap.add_argument("--strong", action="store_true",
                    help="strong scaling: fixed TOTAL rows split across the "
                         "mesh.  On a virtual (shared-host) CPU mesh this is "
                         "the meaningful mode — weak scaling there measures "
                         "host-core saturation, not interconnect scaling.")
    args = ap.parse_args()

    results = []
    for ndev in args.devices:
        per_dev = (max(args.rows_per_dev // ndev, 1024) if args.strong
                   else args.rows_per_dev)
        res = bench_step(ndev, per_dev, args.iters, args.zipf)
        if res is None:
            print(f"# skipping ndev={ndev}: not enough devices", file=sys.stderr)
            continue
        results.append(res)
        print(f"# ndev={ndev}: {res['rows_per_sec']:.0f} rows/s", file=sys.stderr)

    if len(results) >= 2:
        base = results[0]
        for r in results[1:]:
            speedup = (r["rows_per_sec"] / base["rows_per_sec"]) \
                * (base["rows"] / base["rows"])
            # weak-scaling efficiency: per-device throughput retention
            r["scaling_efficiency"] = (
                (r["rows_per_sec"] / r["ndev"]) /
                (base["rows_per_sec"] / base["ndev"])
            )
            print(f"# ndev={r['ndev']}: efficiency "
                  f"{r['scaling_efficiency']:.2%}", file=sys.stderr)

    with open("bench_dist.json", "w") as f:
        json.dump({"results": results, "zipf": args.zipf}, f, indent=2)
    last = results[-1] if results else {"rows_per_sec": 0, "ndev": 0}
    print(json.dumps({
        "metric": f"dist_join_groupby_rows_per_sec_{last['ndev']}dev",
        "value": round(last["rows_per_sec"], 1),
        "unit": "rows/s",
        "vs_baseline": round(last.get("scaling_efficiency", 1.0), 4),
    }))


if __name__ == "__main__":
    main()
