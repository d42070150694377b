"""TPU micro-benchmark: fused Pallas filter+agg kernel vs the XLA mask path.

Times, on pre-generated device int32 data:
  xla     — mask + masked COUNT/SUM/MIN/MAX reductions (what XLA fuses)
  pallas  — filter_agg_i32 (one pass, SMEM accumulators)

Also prints achieved GB/s and the fraction of the ~819 GB/s v5e HBM roofline.

Run on the real TPU: python scripts/micro_filter_agg.py [--rows N]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from gpu_olap_tpu.utils.jaxenv import ensure_jax  # persistent compile cache

jax = ensure_jax()
import jax.numpy as jnp


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[-1:])


def timeit(fn, *args, iters=5, warm=1):
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


HBM_GBPS = 819.0  # v5e per-chip HBM bandwidth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 28)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=16)
    args = ap.parse_args()
    n = args.rows

    from gpu_olap_tpu.ops.pallas.filter_agg import filter_agg_i32

    print(f"device={jax.devices()[0]} rows={n}", flush=True)
    key = jax.random.PRNGKey(0)
    K = args.chain  # kernels chained per program: amortizes the ~60 ms
    # relay dispatch+sync floor so per-kernel device time is resolvable

    @jax.jit
    def gen():
        return jax.random.randint(key, (n,), -1000, 1000, dtype=jnp.int32)

    v = jax.block_until_ready(gen())

    @jax.jit
    def xla_chain(v):
        def body(i, acc):
            thr = np.int32(500) + i  # iteration-dependent: defeats CSE
            mask = v > thr
            cnt = jnp.sum(mask.astype(jnp.int64))
            s = jnp.sum(jnp.where(mask, v.astype(jnp.int64), 0))
            return acc + cnt + s
        return jax.lax.fori_loop(0, np.int32(K), body, jnp.int64(0))

    @jax.jit
    def pallas_chain(v):
        def body(i, acc):
            cnt, ((s, mn, mx),) = filter_agg_i32(
                v, "gt", np.int32(500) + i, (v,), 1, False, n)
            return acc + cnt + s
        return jax.lax.fori_loop(0, np.int32(K), body, jnp.int64(0))

    t_xla = timeit(xla_chain, v, iters=args.iters) / K
    gbs_x = n * 4 / t_xla / 1e9
    print(f"xla     {t_xla*1e3:8.2f} ms  {gbs_x:7.1f} GB/s "
          f"({gbs_x/HBM_GBPS*100:5.1f}% roofline)", flush=True)

    t_pal = timeit(pallas_chain, v, iters=args.iters) / K
    gbs_p = n * 4 / t_pal / 1e9
    print(f"pallas  {t_pal*1e3:8.2f} ms  {gbs_p:7.1f} GB/s "
          f"({gbs_p/HBM_GBPS*100:5.1f}% roofline)", flush=True)

    @jax.jit
    def pallas_cs_chain(v):
        # the SQL matcher's COUNT/SUM-only shape: min/max lanes dropped
        def body(i, acc):
            cnt, ((s, _mn, _mx),) = filter_agg_i32(
                v, "gt", np.int32(500) + i, (v,), 1, False, n,
                ((True, False),))
            return acc + cnt + s
        return jax.lax.fori_loop(0, np.int32(K), body, jnp.int64(0))

    t_cs = timeit(pallas_cs_chain, v, iters=args.iters) / K
    gbs_c = n * 4 / t_cs / 1e9
    print(f"pallas_cs {t_cs*1e3:6.2f} ms  {gbs_c:7.1f} GB/s "
          f"({gbs_c/HBM_GBPS*100:5.1f}% roofline)", flush=True)

    @jax.jit
    def pallas_cs16_chain(v):
        # range-proven |v| < 2^15: single-reduce exact sum
        def body(i, acc):
            cnt, ((s, _mn, _mx),) = filter_agg_i32(
                v, "gt", np.int32(500) + i, (v,), 1, False, n,
                ((True, False, True),))
            return acc + cnt + s
        return jax.lax.fori_loop(0, np.int32(K), body, jnp.int64(0))

    t_c16 = timeit(pallas_cs16_chain, v, iters=args.iters) / K
    gbs_16 = n * 4 / t_c16 / 1e9
    print(f"pallas_cs16 {t_c16*1e3:4.2f} ms  {gbs_16:7.1f} GB/s "
          f"({gbs_16/HBM_GBPS*100:5.1f}% roofline)", flush=True)

    @jax.jit
    def pallas_cnt_chain(v):
        # COUNT-only: ~2 VPU ops/row — the kernel's DMA/pipeline ceiling
        def body(i, acc):
            cnt, _ = filter_agg_i32(v, "gt", np.int32(500) + i, (), 0,
                                    False, n, ())
            return acc + cnt
        return jax.lax.fori_loop(0, np.int32(K), body, jnp.int64(0))

    t_cnt = timeit(pallas_cnt_chain, v, iters=args.iters) / K
    gbs_n = n * 4 / t_cnt / 1e9
    print(f"pallas_cnt {t_cnt*1e3:5.2f} ms  {gbs_n:7.1f} GB/s "
          f"({gbs_n/HBM_GBPS*100:5.1f}% roofline)  [DMA ceiling probe]",
          flush=True)

    # ---- 2-column fused shape (VERDICT r4 #9): filter stream + two
    # distinct value streams per pass; the predicate/mask VPU chain is paid
    # once and amortized over 12 B/row of traffic
    @jax.jit
    def gen2():
        k2 = jax.random.PRNGKey(7)
        a = jax.random.randint(k2, (n,), -1000, 1000, dtype=jnp.int32)
        b = jax.random.randint(jax.random.PRNGKey(8), (n,), -1000, 1000,
                               dtype=jnp.int32)
        return a, b

    a_col, b_col = jax.block_until_ready(gen2())

    @jax.jit
    def pallas_2col_chain(h, a, b):
        def body(i, acc):
            cnt, ((sa, _a, _b), (sb, _c, _d)) = filter_agg_i32(
                h, "gt", np.int32(500) + i, (a, b), 2, False, n,
                ((True, False, True), (True, False, True)))
            return acc + cnt + sa + sb
        return jax.lax.fori_loop(0, np.int32(K), body, jnp.int64(0))

    t_2c = timeit(pallas_2col_chain, v, a_col, b_col, iters=args.iters) / K
    gbs_2c = 3 * n * 4 / t_2c / 1e9
    print(f"pallas_2col {t_2c*1e3:4.2f} ms  {gbs_2c:7.1f} GB/s "
          f"({gbs_2c/HBM_GBPS*100:5.1f}% roofline)  [3 streams, 12 B/row]",
          flush=True)

    # 2-col parity vs XLA on the same data
    m = v > 500
    exp_sa = int(jnp.sum(jnp.where(m, a_col.astype(jnp.int64), 0)))
    exp_sb = int(jnp.sum(jnp.where(m, b_col.astype(jnp.int64), 0)))
    cnt2, ((sa2, _, _), (sb2, _, _)) = filter_agg_i32(
        v, "gt", 500, (a_col, b_col), 2, False, n,
        ((True, False, True), (True, False, True)))
    ok2 = int(sa2) == exp_sa and int(sb2) == exp_sb
    print(f"2col parity={ok2}", flush=True)

    def xla_path(v):
        mask = v > 500
        cnt = jnp.sum(mask.astype(jnp.int64))
        s = jnp.sum(jnp.where(mask, v.astype(jnp.int64), 0))
        mn = jnp.min(jnp.where(mask, v, np.int32(2**31 - 1)))
        mx = jnp.max(jnp.where(mask, v, np.int32(-2**31)))
        return cnt, s, mn, mx

    xla_path = jax.jit(xla_path)

    def pallas_path(v):
        cnt, ((s, mn, mx),) = filter_agg_i32(v, "gt", 500, (v,), 1, False, n)
        return cnt, s, mn, mx

    rx = jax.block_until_ready(xla_path(v))
    rp = jax.block_until_ready(pallas_path(v))
    ok = all(int(a) == int(b) for a, b in zip(rx, rp))
    print(f"parity={ok} count={int(rp[0])} sum={int(rp[1])}", flush=True)

    print(json.dumps({
        "rows": n,
        "xla_ms": round(t_xla * 1e3, 2),
        "pallas_ms": round(t_pal * 1e3, 2),
        "pallas_cs_ms": round(t_cs * 1e3, 2),
        "xla_roofline": round(gbs_x / HBM_GBPS, 3),
        "pallas_roofline": round(gbs_p / HBM_GBPS, 3),
        "pallas_cs_roofline": round(gbs_c / HBM_GBPS, 3),
        "pallas_2col_ms": round(t_2c * 1e3, 2),
        "pallas_2col_roofline": round(gbs_2c / HBM_GBPS, 3),
        "pallas_cnt_roofline": round(gbs_n / HBM_GBPS, 3),
        "parity": bool(ok),
        "parity_2col": bool(ok2),
    }), flush=True)


if __name__ == "__main__":
    main()
