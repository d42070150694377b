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
        # a=1.5: the hot key carries ~38% of probe mass (1/zeta(1.5)) — a
        # genuinely skewed BASELINE config-5 shape that exceeds a device's
        # uniform share at any mesh size, so the broadcast path must engage
        raw = rng.zipf(1.5, n).astype(np.int64)
        lk = np.clip(raw, 1, n_keys) - 1
    else:
        lk = rng.integers(0, n_keys, n).astype(np.int64)
    rk = rng.integers(0, n_keys, n).astype(np.int64)
    lv = rng.integers(1, 100, n).astype(np.int64)
    rv = rng.integers(1, 100, n).astype(np.int64)

    import jax.numpy as jnp

    heavy = np.zeros(0, dtype=np.int64)
    if zipf:
        # BASELINE config 5: heavy probe keys (host-side detection) engage
        # the broadcast path — their build rows replicate, their probe rows
        # join locally, so no device receives a hot key's full probe mass
        heavy = skew.detect_heavy_keys(lk, row_threshold=max(
            256, rows_per_dev // 4))
        light_mask = ~np.isin(lk, heavy)
        hist = np.asarray(skew.partition_histogram(
            jnp.asarray(lk[light_mask]), ndev))
    else:
        hist = np.asarray(skew.partition_histogram(jnp.asarray(lk), ndev))
    # shuffle capacity must hold BOTH shuffled sides: the (light) probe
    # histogram peak AND the ~uniform build side
    rhist = np.asarray(skew.partition_histogram(jnp.asarray(rk), ndev))
    capacity = max(
        skew.recommend_capacity(hist, ndev, headroom=1.6 if zipf else 1.3),
        skew.recommend_capacity(rhist, ndev, headroom=1.3))
    # expected matches/probe ~= n_right/n_keys = 16; 1.5x headroom.  (An
    # oversized buffer is pure waste: every downstream sort runs at the
    # buffer size, not the match count.)
    join_capacity = rows_per_dev * 24
    if zipf:
        # heavy probe rows join locally: worst-case heavy mass on one device
        # is ~its local share; matches ~= share * dups (16) — keep the same
        # headroom rule as the light side
        join_capacity = rows_per_dev * 32

    max_groups = min(n_keys, 1 << 20)
    if heavy.size:
        dups = max(n // n_keys, 1)
        heavy_build_cap = max(256, 4 * dups * int(heavy.size))
        step = dist_ops.make_dist_join_groupby_skew(
            mesh, capacity=capacity, join_capacity=join_capacity,
            max_groups=max_groups, agg_funcs=("sum", "count"),
            heavy_keys=heavy, heavy_build_cap=heavy_build_cap,
        )
    else:
        step = dist_ops.make_dist_join_groupby(
            mesh, capacity=capacity, join_capacity=join_capacity,
            max_groups=max_groups, agg_funcs=("sum", "count"),
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

    out_d = {"ndev": ndev, "rows": total_rows, "seconds": best,
             "rows_per_sec": total_rows / best,
             "shuffle_capacity": int(capacity)}
    if heavy.size:
        out_d["mode"] = "skew-broadcast"
        out_d["heavy_keys"] = int(heavy.size)
        heavy_mass = float(np.isin(lk, heavy).mean())
        out_d["heavy_probe_mass"] = round(heavy_mass, 4)
        return out_d

    # ---- per-stage attribution (uniform program only): shuffle
    # (all-to-all) vs local compute ----
    shuf_fn, local_fn = dist_ops.make_dist_join_groupby_stages(
        mesh, capacity=capacity, join_capacity=join_capacity,
        max_groups=max_groups, agg_funcs=("sum", "count"))
    shuffled = shuf_fn(*args_d)
    np.asarray(shuffled[0].addressable_shards[0].data[:1])
    t_shuf = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        shuffled = shuf_fn(*args_d)
        jax.block_until_ready(shuffled)
        t_shuf = min(t_shuf, time.perf_counter() - t0)
    largs = shuffled[:6]
    lout = local_fn(*largs)
    jax.block_until_ready(lout)
    t_local = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        lout = local_fn(*largs)
        jax.block_until_ready(lout)
        t_local = min(t_local, time.perf_counter() - t0)

    out_d.update({"shuffle_seconds": t_shuf, "local_seconds": t_local,
                  "shuffle_frac": round(t_shuf / (t_shuf + t_local), 4)})
    return out_d


def run_pinned(ndev: int, cores: str, rows_per_dev: int, iters: int,
               zipf: bool = False):
    """Subprocess with a pinned CPU set and its own virtual device count —
    the only way to hold CPU-per-device constant across mesh sizes on a
    shared host (VERDICT r3 #6: measure, don't model, the environment)."""
    import os
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    cmd = ["taskset", "-c", cores, sys.executable, __file__,
           "--oneshot", str(ndev), "--rows-per-dev", str(rows_per_dev),
           "--iters", str(iters)] + (["--zipf"] if zipf else [])
    proc = subprocess.run(cmd, stdout=subprocess.PIPE, env=env, timeout=3600)
    for line in reversed(proc.stdout.decode().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"pinned run ndev={ndev} produced no JSON "
                       f"(rc={proc.returncode})")


def compute_bound_protocol(rows_per_dev: int, iters: int, zipf: bool = False):
    """Weak-scaling efficiency with CPU-per-device held constant: the
    1-device baseline runs pinned to ONE core; the 2-device mesh gets both
    cores (one per device).  Unlike the raw virtual-mesh curve (8 devices
    timesharing 2 cores), the per-device compute resource is identical
    across the two runs, so t1/t2 is a real parallel-scaling measurement:
    the only added cost at 2 devices is the all-to-all exchange."""
    import os

    ncores = os.cpu_count() or 1
    if ncores < 2:
        print("# <2 cores: compute-bound protocol unavailable", file=sys.stderr)
        return None
    base = run_pinned(1, "0", rows_per_dev, iters, zipf)
    two = run_pinned(2, "0,1", rows_per_dev, iters, zipf)
    eff = base["seconds"] / two["seconds"]
    out = {"mode": "compute-bound-weak" + ("-zipf" if zipf else ""),
           "rows_per_dev": rows_per_dev, "zipf": zipf,
           "baseline_1dev_1core": base, "mesh_2dev_2core": two,
           "weak_scaling_efficiency": round(eff, 4)}
    print(f"# compute-bound weak scaling{' (zipf)' if zipf else ''}: "
          f"t1={base['seconds']:.3f}s "
          f"t2={two['seconds']:.3f}s efficiency={eff:.2%} "
          f"(2dev shuffle_frac={two.get('shuffle_frac')})", file=sys.stderr)
    return out


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
    ap.add_argument("--oneshot", type=int, default=None,
                    help="(internal) run ONE mesh size, print one JSON line")
    ap.add_argument("--compute-bound", action="store_true",
                    help="pinned-core weak-scaling protocol: 1dev@1core vs "
                         "2dev@2cores (constant CPU per device)")
    args = ap.parse_args()

    if args.oneshot is not None:
        res = bench_step(args.oneshot, args.rows_per_dev, args.iters,
                         args.zipf)
        print(json.dumps(res))
        return

    if args.compute_bound:
        out = compute_bound_protocol(args.rows_per_dev, args.iters, args.zipf)
        if out is not None:
            try:
                with open("bench_dist.json") as f:
                    payload = json.load(f)
            except (OSError, json.JSONDecodeError):
                payload = {}
            key = "compute_bound_zipf" if args.zipf else "compute_bound"
            payload[key] = out
            if args.zipf:
                payload["zipf"] = True  # the skew config has a recorded run
            with open("bench_dist.json", "w") as f:
                json.dump(payload, f, indent=2)
            tag = "_zipf" if args.zipf else ""
            print(json.dumps({
                "metric": f"dist_weak_scaling_efficiency_2dev{tag}",
                "value": out["weak_scaling_efficiency"],
                "unit": "frac",
                "vs_baseline": round(out["weak_scaling_efficiency"] / 0.7, 4),
            }))
        return

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

    try:
        with open("bench_dist.json") as f:
            payload = json.load(f)
    except (OSError, json.JSONDecodeError):
        payload = {}
    payload["results_zipf" if args.zipf else "results"] = results
    if args.zipf:
        payload["zipf"] = True
    elif "zipf" not in payload:
        payload["zipf"] = False
    with open("bench_dist.json", "w") as f:
        json.dump(payload, f, indent=2)
    last = results[-1] if results else {"rows_per_sec": 0, "ndev": 0}
    print(json.dumps({
        "metric": f"dist_join_groupby_rows_per_sec_{last['ndev']}dev",
        "value": round(last["rows_per_sec"], 1),
        "unit": "rows/s",
        "vs_baseline": round(last.get("scaling_efficiency", 1.0), 4),
    }))


if __name__ == "__main__":
    main()
