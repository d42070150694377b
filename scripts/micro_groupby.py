"""Stage-by-stage decomposition of the grouped-aggregation program at
benchmark scale — identifies where the measured exec time goes.

One TPU process at a time.  Usage: python scripts/micro_groupby.py
"""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, iters=3):
    import jax

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf if leaf.ndim == 0 else leaf[-1:])

    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    n = 100_663_296  # the bench's padded capacity for 100M rows
    n_real = 100_000_000
    n_groups = 4_000_000
    max_groups = 1 << 23
    rng = np.random.default_rng(1)
    k = jax.device_put(rng.integers(0, n_groups, n).astype(np.int32))
    v = jax.device_put(rng.integers(0, 1_000_000, n).astype(np.int32))
    print(f"n={n:,} groups={n_groups:,} max_groups={max_groups:,}", flush=True)

    def rec(name, secs):
        print(f"{name:42s} {secs*1e3:9.1f} ms", flush=True)

    i32max = np.int32(np.iinfo(np.int32).max)

    def stage_sort(k, v):
        pad = jnp.arange(n, dtype=jnp.int32) >= n_real
        km = jnp.where(pad, i32max, k)
        return jax.lax.sort((km, v), num_keys=2)

    rec("1 main sort (k,v) 2-key", timeit(jax.jit(stage_sort), k, v))

    def stage_flags(k, v):
        ks, vs = stage_sort(k, v)
        arange32 = jnp.arange(n, dtype=jnp.int32)
        in_prefix = arange32 < n_real
        newflag = jnp.concatenate([jnp.ones(1, bool), ks[1:] != ks[:-1]])
        newflag = newflag & in_prefix
        gid = jnp.cumsum(newflag.astype(jnp.int32)) - 1
        return newflag, jnp.sum(newflag.astype(jnp.int32)), gid

    rec("2 + newflag/cumsum", timeit(jax.jit(stage_flags), k, v))

    def stage_bounds(k, v):
        newflag, ngroups, _ = stage_flags(k, v)
        arange32 = jnp.arange(n, dtype=jnp.int32)
        _, pos = jax.lax.sort(((~newflag).astype(jnp.int32), arange32),
                              num_keys=1)
        return pos[:max_groups], ngroups

    rec("3 + boundary compaction sort", timeit(jax.jit(stage_bounds), k, v))

    from gpu_olap_tpu.ops import aggregate as agg_ops

    def full(k, v):
        specs = [
            {"func": "sum", "values": v.astype(jnp.int64), "valid": None,
             "distinct": False, "acc_dtype": np.int64, "np_kind": "i",
             "arg_id": "v", "int32_ok": True, "sum_f64_ok": True},
            {"func": "min", "values": v.astype(jnp.int64), "valid": None,
             "distinct": False, "acc_dtype": np.int64, "np_kind": "i",
             "arg_id": "v", "int32_ok": True},
            {"func": "max", "values": v.astype(jnp.int64), "valid": None,
             "distinct": False, "acc_dtype": np.int64, "np_kind": "i",
             "arg_id": "v", "int32_ok": True},
        ]
        return agg_ops.groupby_aggregate(
            [(k, None)], None, specs, max_groups, n_rows=n,
            prefix_rows=n_real)

    rec("4 full groupby_aggregate", timeit(jax.jit(full), k, v))

    def full_plus_output(k, v):
        group_codes, results, ngroups, _ = full(k, v)
        rv = jnp.arange(max_groups) < ngroups
        inv = (~rv).astype(jnp.int32)
        ar = jnp.arange(max_groups, dtype=jnp.int32)
        _, gidx = jax.lax.sort((inv, ar), num_keys=1)
        outs = [group_codes[0][0][gidx]] + [r[0][gidx] for r in results]
        return outs

    rec("5 + output compaction/gathers", timeit(jax.jit(full_plus_output), k, v))


if __name__ == "__main__":
    main()
