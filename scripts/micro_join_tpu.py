"""Stage-by-stage TPU timing of the non-unique-key join pipeline.

Round-3 diagnosis: the honest 25Mx25M join shape measured 8.4M rows/s
end-to-end (bench_results_quick.json) while round-2's unique-build lookup
shape ran 110M rows/s.  This script times each stage of
ops/join.py:inner_join in isolation on the real device to find the cliff.

Usage: python scripts/micro_join_tpu.py [n_per_side] [expansion]
"""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gpu_olap_tpu.ops import join as J  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
EXP = float(sys.argv[2]) if len(sys.argv) > 2 else 2.2
CAP = int(2 * N * EXP) if len(sys.argv) <= 3 else int(sys.argv[3])

rng = np.random.default_rng(2)
nkeys = N // 2
lk = rng.integers(0, nkeys, N).astype(np.int32)
rk = rng.integers(0, nkeys, N).astype(np.int32)
dev = jax.devices()[0]
print(f"device={dev} n={N} cap={CAP}", flush=True)
lkd = jax.device_put(jnp.asarray(lk), dev)
rkd = jax.device_put(jnp.asarray(rk), dev)
inv = jnp.zeros(N, dtype=bool)


def timeit(name, fn, *args, iters=3):
    f = jax.jit(fn)
    out = f(*args)
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[-1:])  # force through the relay
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        leaves = jax.tree_util.tree_leaves(out)
        for lv in leaves:
            np.asarray(lv.ravel()[-1:])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:10.1f} ms", flush=True)
    return best, out


res = {}
import os
SKIP_EARLY = os.environ.get("SKIP_EARLY") == "1"

# stage 1: build-side sort (3 operands: inv, key, rowid)
if not SKIP_EARLY:
    res["build_sorted"], _ = timeit(
        "build_sorted", lambda rc: J.build_sorted(rc, inv)[0], rkd)

# stage 2: tagged co-sort merge probe (2N elements)
if SKIP_EARLY:
    lo, cnt = jax.jit(lambda rc, lc: J.probe_ranges_merge(
        rc, inv, lc, inv, fold_range=(0, nkeys - 1)))(rkd, lkd)
else:
    res["probe_ranges_merge"], (lo, cnt) = timeit(
        "probe_ranges_merge",
        lambda rc, lc: J.probe_ranges_merge(rc, inv, lc, inv,
                                            fold_range=(0, nkeys - 1)), rkd, lkd)

# stage 2b: its pieces — one co-sort vs the restore sort
def piece_cosort(rc, lc):
    key = (jnp.concatenate([rc, lc])) * 2
    key = key + jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)])
    pidx = jnp.concatenate([jnp.full(N, N, jnp.int32), jnp.arange(N, dtype=jnp.int32)])
    return jax.lax.sort((key, pidx), num_keys=1)


if not SKIP_EARLY:
    res["cosort_2op_2N"], _ = timeit("  cosort (2 ops, 2N)", piece_cosort, rkd, lkd)

def piece_scans(rc, lc):
    key_s, pidx_s = piece_cosort(rc, lc)
    run_key = key_s >> 1
    is_build = (key_s & 1) == 0
    newflag = jnp.concatenate([jnp.ones(1, bool), run_key[1:] != run_key[:-1]])
    cb = jnp.cumsum(is_build.astype(jnp.int32))
    run_base = jax.lax.cummax(
        jnp.where(newflag, cb - is_build.astype(jnp.int32), jnp.int32(-1)))
    return cb, run_base


if not SKIP_EARLY:
    res["cosort+scans"], _ = timeit("  cosort + cumsum/cummax", piece_scans, rkd, lkd)

# stage 3: expand_matches (repeat + gathers at CAP)
srow = jnp.arange(N, dtype=jnp.int32)


def piece_expand(cnt, lo):
    return J.expand_matches(cnt, lo, srow, CAP)[:3]


res["expand_matches"], _ = timeit("expand_matches", piece_expand, cnt, lo)


# expand pieces: repeat alone, then gathers alone
def piece_repeat(cnt):
    c32 = cnt.astype(jnp.int32)
    return jnp.repeat(jnp.arange(N, dtype=jnp.int32), c32,
                      total_repeat_length=CAP)


res["repeat_only"], pidx_out = timeit("  repeat only", piece_repeat, cnt)


def piece_gather(pidx, lo):
    starts = jnp.zeros(N, jnp.int32)
    off = jnp.arange(CAP, dtype=jnp.int32) - starts[pidx]
    bpos = jnp.clip(lo.astype(jnp.int32)[pidx] + off, 0, N - 1)
    return srow[bpos]


res["gathers_capacity"], _ = timeit("  2x gather at CAP", piece_gather,
                                    pidx_out, lo)

# stage 4: the bench SUM over both sides at CAP
def piece_sum(pidx, lo):
    bpos = jnp.clip(lo.astype(jnp.int32)[pidx], 0, N - 1)
    lv = lkd[pidx].astype(jnp.int64)
    rv = rkd[bpos].astype(jnp.int64)
    return jnp.sum(jnp.where(jnp.arange(CAP) < CAP, lv + rv, 0))


res["final_sum_gathers"], _ = timeit("final gathers + sum", piece_sum,
                                     pidx_out, lo)

print(json.dumps({k: round(v * 1e3, 1) for k, v in res.items()}))
