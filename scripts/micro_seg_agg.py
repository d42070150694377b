"""TPU micro-benchmark: seg_agg Pallas kernel vs the XLA post-sort pipeline.

Times, on pre-generated device data:
  sort       — lax.sort of (k, v) int32 lanes (shared prefix of both paths)
  xla_post   — the existing groupby_aggregate post-sort machinery
  pallas     — seg_agg_sorted_i32 on the pre-sorted lanes

Run on the real TPU: python scripts/micro_seg_agg.py [--rows N] [--groups G]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _sync(r):
    # relay sync: force a SCALAR readback — slice on device first, else the
    # whole array is pulled through the slow relay and dominates the timing
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[-1:])


def timeit(fn, *args, iters=3, warm=1):
    for _ in range(warm):
        r = fn(*args)
        jax.block_until_ready(r)
        _sync(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        _sync(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 27)
    ap.add_argument("--groups", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    n, g = args.rows, args.groups

    from gpu_olap_tpu.ops.pallas.seg_agg import SB, seg_agg_sorted_i32

    n = -(-n // SB) * SB
    print(f"device={jax.devices()[0]} rows={n} groups={g}", flush=True)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    @jax.jit
    def gen():
        k = jax.random.randint(k1, (n,), 0, g, dtype=jnp.int32)
        v = jax.random.randint(k2, (n,), 0, 1 << 20, dtype=jnp.int32)
        return k, v

    k, v = jax.block_until_ready(gen())

    @jax.jit
    def do_sort(k, v):
        return jax.lax.sort((k, v), num_keys=2)

    t_sort = timeit(do_sort, k, v, iters=args.iters)
    print(f"sort        {t_sort*1e3:8.1f} ms  ({n/t_sort/1e6:7.1f}M rows/s)",
          flush=True)

    ks, vs = jax.block_until_ready(do_sort(k, v))

    # --- pallas post-sort ---
    max_groups = g + 8

    # MUST be jitted: eager mode dispatches every XLA glue op separately
    # through the relay (~30 ms floor each), which round-2/3 logs mistook
    # for kernel time (1252 ms "measured" vs 216 ms jitted)
    pallas_post = jax.jit(
        lambda ks, vs: seg_agg_sorted_i32(ks, vs, max_groups, False))

    t_pal = timeit(pallas_post, ks, vs, iters=args.iters)
    print(f"pallas_post {t_pal*1e3:8.1f} ms  ({n/t_pal/1e6:7.1f}M rows/s)",
          flush=True)

    # correctness spot-check vs numpy on a small prefix-complete slice
    kk, cc, ss, mn, mx, ng = jax.block_until_ready(pallas_post(ks, vs))
    ngi = int(ng)
    hk = np.asarray(kk[:8]); hc = np.asarray(cc[:8]); hs = np.asarray(ss[:8])
    kh = np.asarray(ks); vh = np.asarray(vs).astype(np.int64)
    uk, idx, cnts = np.unique(kh, return_index=True, return_counts=True)
    sums = np.add.reduceat(vh, idx)
    mins = np.minimum.reduceat(np.asarray(vs), idx)
    ends = np.concatenate([idx[1:], [len(kh)]])
    maxs = np.asarray(vs)[ends - 1]
    ok = (ngi == len(uk) and np.array_equal(hk, uk[:8])
          and np.array_equal(hc, cnts[:8]) and np.array_equal(hs, sums[:8]))
    # sampled full-range parity: 4096 evenly spaced groups, gathered on device
    pick = np.linspace(0, len(uk) - 1, 4096).astype(np.int32)
    pick_d = jnp.asarray(pick)

    @jax.jit
    def sample(kk, cc, ss, mn, mx):
        return kk[pick_d], cc[pick_d], ss[pick_d], mn[pick_d], mx[pick_d]

    sk_, sc_, ss_, smn_, smx_ = (np.asarray(x) for x in
                                 sample(kk, cc, ss, mn, mx))
    samp_ok = (np.array_equal(sk_, uk[pick])
               and np.array_equal(sc_, cnts[pick])
               and np.array_equal(ss_, sums[pick])
               and np.array_equal(smn_, mins[pick])
               and np.array_equal(smx_, maxs[pick]))
    ok = bool(ok and samp_ok)
    print(f"n_groups={ngi} expected={len(uk)} head_ok={ok} "
          f"(sampled 4096: {samp_ok})", flush=True)

    # --- existing XLA groupby machinery (sort + post-sort), for comparison ---
    from gpu_olap_tpu.ops import aggregate as agg

    def xla_full(k, v):
        base = {"values": v, "valid": None, "distinct": False,
                "acc_dtype": np.int64, "np_kind": "i", "arg_id": "v",
                "int32_ok": True}
        aggs = [dict(base, func="sum"), dict(base, func="min"),
                dict(base, func="max")]
        return agg.groupby_aggregate([(k, None)], None, aggs, max_groups,
                                     prefix_rows=n, allow_pallas=False)

    xla_full_j = jax.jit(xla_full)
    t_xla = timeit(xla_full_j, k, v, iters=args.iters)
    print(f"xla_full    {t_xla*1e3:8.1f} ms  ({n/t_xla/1e6:7.1f}M rows/s)  "
          f"[sort + post]", flush=True)

    total_pal = t_sort + t_pal
    print(json.dumps({
        "rows": n, "groups": g,
        "sort_ms": round(t_sort * 1e3, 1),
        "pallas_post_ms": round(t_pal * 1e3, 1),
        "xla_full_ms": round(t_xla * 1e3, 1),
        "pallas_total_rows_per_sec": round(n / total_pal / 1e6, 1),
        "xla_rows_per_sec": round(n / t_xla / 1e6, 1),
        "head_ok": bool(ok),
    }), flush=True)


if __name__ == "__main__":
    main()
