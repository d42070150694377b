"""TPU primitive microbenchmarks at benchmark scale (100M rows).

Grounds kernel design decisions (DESIGN_NOTES.md table was measured at 16M;
this re-measures at the BASELINE workload scale).  One TPU process at a time —
run only when bench.py is not running.

Usage: python scripts/micro_tpu.py [--n 100000000]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    # relay-safe sync: force a scalar readback
    np.asarray(leaf if leaf.ndim == 0 else leaf[-1:])


def timeit(fn, *args, iters=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--table", type=int, default=10_000_000)
    args = ap.parse_args()
    import jax

    jax.config.update("jax_enable_x64", True)  # engine runs with x64 on
    import jax.numpy as jnp

    n, m = args.n, args.table
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}, n={n:,}, table={m:,}", flush=True)

    idx64 = jax.device_put(rng.integers(0, m, n).astype(np.int64))
    idx32 = jax.device_put(np.asarray(idx64).astype(np.int32))
    tab64 = jax.device_put(rng.integers(0, 1000, m).astype(np.int64))
    tab32 = jax.device_put(np.asarray(tab64).astype(np.int32))
    k32 = jax.device_put(rng.integers(0, 1 << 22, n).astype(np.int32))
    v32 = jax.device_put(rng.integers(0, 1 << 20, n).astype(np.int32))
    k64 = jax.device_put(np.asarray(k32).astype(np.int64))

    results = {}

    def rec(name, secs):
        results[name] = secs
        print(f"{name:38s} {secs*1e3:9.1f} ms   {n/secs/1e6:9.1f} M rows/s",
              flush=True)

    f = jax.jit(lambda t, i: jnp.sum(t[i]))
    rec("gather i64[i64] 10M tab", timeit(f, tab64, idx64))
    rec("gather i64[i32] 10M tab", timeit(f, tab64, idx32))
    rec("gather i32[i32] 10M tab", timeit(f, tab32, idx32))

    # table-size sweep: locality effect on random gather
    for tm in (1 << 16, 1 << 20, 1 << 23):
        tt = jax.device_put(rng.integers(0, 1000, tm).astype(np.int32))
        ii = jax.device_put(rng.integers(0, tm, n).astype(np.int32))
        rec(f"gather i32[i32] tab={tm:>9,}", timeit(f, tt, ii))
    # monotonic (sorted) indices: sequential-ish access pattern
    idx_sorted = jax.device_put(np.sort(np.asarray(idx32)))
    rec("gather i32[i32] sorted idx", timeit(f, tab32, idx_sorted))

    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    rec("sort i32 key + i32 payload", timeit(f, k32, v32))
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    rec("sort (i32,i32) 2-key", timeit(f, k32, v32))
    f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
    rec("sort (i32,i32)key + i32 payload",
        timeit(f, k32, v32, idx32))
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    rec("sort i64 key + i32 payload", timeit(f, k64, v32))
    f = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1))
    rec("sort i32 single", timeit(f, k32))

    f = jax.jit(lambda a: jnp.cumsum(a))
    rec("cumsum i32", timeit(f, v32))
    f = jax.jit(lambda a: jnp.cumsum(a.astype(jnp.int64)))
    rec("cumsum i64 (from i32)", timeit(f, v32))

    q = jax.device_put(np.arange(4_000_001, dtype=np.int32))
    (ks,) = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1))(k32)
    f = jax.jit(lambda a, qq: jnp.searchsorted(a, qq, side="left",
                                               method="sort"))
    rec("searchsorted 4M q in 100M (sort)", timeit(f, ks, q))
    qbig = jax.device_put(rng.integers(0, 1 << 22, n).astype(np.int32))
    kssmall = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1))(
        jax.device_put(rng.integers(0, 1 << 22, m).astype(np.int32)))[0]
    rec("searchsorted 100M q in 10M (sort)", timeit(f, kssmall, qbig))

    f = jax.jit(lambda c: jnp.repeat(
        jnp.arange(c.shape[0], dtype=jnp.int32), c,
        total_repeat_length=4 * c.shape[0]))
    ones = jax.device_put(np.full(n // 4, 4, dtype=np.int32))
    rec("repeat 25M cnts -> 100M (i32)", timeit(f, ones))

    k64t = jax.device_put(rng.integers(0, 1 << 40, n).astype(np.int64))
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    rec("sort TRUE i64 key + i32 payload", timeit(f, k64t, v32))
    f = jax.jit(lambda a: jax.lax.cummax(a))
    rec("cummax i32", timeit(f, v32))

    from gpu_olap_tpu.ops import join as join_ops

    m4 = n // 4
    bc = jax.device_put(rng.integers(0, m4 // 4, m4).astype(np.int32))
    pc = jax.device_put(rng.integers(0, m4 // 4, m4).astype(np.int32))
    zb = jax.device_put(np.zeros(m4, dtype=bool))
    f = jax.jit(lambda b, p, z: join_ops.probe_ranges_merge(b, z, p, z))
    t = timeit(f, bc, pc, zb)
    print(f"{'probe_ranges_merge 25Mx25M i64fold':38s} {t*1e3:9.1f} ms   "
          f"{2*m4/t/1e6:9.1f} M rows/s", flush=True)
    fr = (0, m4 // 4)
    f = jax.jit(lambda b, p, z: join_ops.probe_ranges_merge(
        b, z, p, z, fold_range=fr))
    t = timeit(f, bc, pc, zb)
    print(f"{'probe_ranges_merge 25Mx25M i32fold':38s} {t*1e3:9.1f} ms   "
          f"{2*m4/t/1e6:9.1f} M rows/s", flush=True)

    import json

    with open("micro_tpu.json", "w") as fp:
        json.dump(results, fp, indent=2)


if __name__ == "__main__":
    main()
