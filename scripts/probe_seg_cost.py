"""Bisect the seg_agg kernel's on-TPU cost: time stripped-down variants.

Variants (cumulative):
  v0_io      — read input block, trivial reduce, write 1 scalar
  v1_prep    — + boundary mask, cumsums, field splits
  v2_route   — + the 12-stage butterfly (6 streams)
  v3_stage   — + staging window add (dynamic sublane offset)
  full       — the real seg_agg kernel (engine code)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from gpu_olap_tpu.ops.pallas.routing import (  # noqa: E402
    LANES, _c, _cumsum_flat, _pos_iota, _shift_right1, _sum_i32, route_left)
from gpu_olap_tpu.ops.pallas.seg_agg import (  # noqa: E402
    RIN, SB, SR, seg_agg_sorted_i32)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 27
N = -(-N // SB) * SB
G = 1 << 22

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
k = jax.random.randint(k1, (N,), 0, G, dtype=jnp.int32)
v = jax.random.randint(k2, (N,), 0, 1 << 20, dtype=jnp.int32)
ks, vs = jax.block_until_ready(jax.jit(
    lambda a, b: jax.lax.sort((a, b), num_keys=2))(k, v))
print(f"device={jax.devices()[0]} rows={N}", flush=True)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = jax.block_until_ready(f(*args))
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} {best*1e3:8.1f} ms ({N/best/1e6:7.1f}M rows/s)",
          flush=True)


def make_variant(level):
    def kern(sk_ref, sv_ref, out_ref, stg, scal, hbm_out, dsem):
        i = pl.program_id(0)

        @pl.when(i == _c(0))
        def _():
            stg[...] = jnp.zeros((SR, LANES), jnp.int32)
            scal[0] = _c(0)

        sk = sk_ref[...]
        sv = sv_ref[...]
        acc = _sum_i32(sk) + _sum_i32(sv)
        if level >= 1 or level >= 3:
            pos16 = _pos_iota(RIN)
            prev_k = _shift_right1(sk, scal[0])
            m32 = (sk != prev_k).astype(jnp.int32)
            incl = _cumsum_flat(m32)
            lo16 = sv & _c(0xFFFF)
            hi16 = sv >> _c(16)
            clo = _cumsum_flat(lo16) - lo16
            chi = _cumsum_flat(hi16) - hi16
            acc = acc + _sum_i32(incl) + _sum_i32(clo) + _sum_i32(chi)
        if level >= 2:
            f = scal[0]
            fr = jnp.maximum(f - _c(1), _c(0)) // _c(LANES)
            relf = f - fr * _c(LANES)
            m = m32 != _c(0)
            tgt = relf + incl - _c(1)
            delta = (pos16 + _c(2 * LANES)) - tgt
            d_arr = jnp.concatenate(
                [jnp.full((2, LANES), -1, jnp.int32),
                 jnp.where(m, delta, _c(-1))], axis=0)

            def lift(x):
                return jnp.concatenate(
                    [jnp.zeros((2, LANES), jnp.int32),
                     jnp.where(m, x, _c(0))], axis=0)

            routed = route_left(d_arr, [lift(sk), lift(sv), lift(clo),
                                        lift(chi), lift(pos16),
                                        lift(incl)], 12)
            acc = acc + _sum_i32(routed[0][:RIN]) + _sum_i32(routed[1][:RIN])
        if level == 3:   # dynamic sublane window RMW (the real kernel's form)
            win = pl.ds(fr, 18)
            for r in routed:
                stg[win, :] = stg[win, :] + r
            acc = acc + stg[0, 0]
        if level == 4:   # static window RMW (control)
            for r in routed:
                stg[0:18, :] = stg[0:18, :] + r
            acc = acc + stg[0, 0]
        if level == 6:   # v4 + ONE unconditional tiny HBM DMA per step
            for r in routed:
                stg[0:18, :] = stg[0:18, :] + r
            pltpu.make_async_copy(stg.at[0:1, :], hbm_out.at[0:1, :],
                                  dsem.at[np.int32(0)]).start()
            pltpu.make_async_copy(stg.at[0:1, :], hbm_out.at[0:1, :],
                                  dsem.at[np.int32(0)]).wait()
            acc = acc + stg[0, 0]
        if level == 7:   # v4 + the real conditional 16-row flush cadence
            for r in routed:
                stg[0:18, :] = stg[0:18, :] + r

            @pl.when((i & _c(15)) == _c(15))
            def _():
                dst = jnp.minimum(i // _c(16), _c(4096 // 16 - 1)) * _c(16)
                pltpu.make_async_copy(stg.at[0:16, :],
                                      hbm_out.at[pl.ds(dst, 16), :],
                                      dsem.at[np.int32(0)]).start()
                pltpu.make_async_copy(stg.at[0:16, :],
                                      hbm_out.at[pl.ds(dst, 16), :],
                                      dsem.at[np.int32(0)]).wait()
            acc = acc + stg[0, 0]
        if level == 8:   # v7 + per-step scalar reads from VMEM input refs
            for r in routed:
                stg[0:18, :] = stg[0:18, :] + r
            scal[1] = sk_ref[15, 127]
            acc = acc + stg[0, 0] + sv_ref[15, 127]
        if level == 9:   # v7 + the full routed-space algebra (no scalar reads)
            from gpu_olap_tpu.ops.pallas.routing import (
                _add64, _shift_left, _split64, _shift_right1 as _sr1)
            rkey, rmin, rpv, ridx, rclo, rchi = routed
            rel18 = _pos_iota(18)
            d_open = relf + _sum_i32(m32) - _c(1)
            start = jnp.maximum(relf - _c(1), _c(0))
            occ_open = rel18 == d_open
            occ_closed = (rel18 >= start) & (rel18 < d_open)
            occ = occ_closed | occ_open
            tot_lo = _sum_i32(lo16); tot_hi = _sum_i32(hi16)
            r_ext = jnp.where(occ_open, _c(2047), _shift_left(ridx, 1))
            clo_x = jnp.where(occ_open, tot_lo, _shift_left(rclo, 1))
            chi_x = jnp.where(occ_open, tot_hi, _shift_left(rchi, 1))
            maxc = jnp.where(occ_closed, _shift_left(rpv, 1), _c(0))
            at_start = rel18 == start
            r_left = jnp.where(at_start, _c(-1), _sr1(r_ext, _c(0)))
            clo_l = jnp.where(at_start, _c(0), _sr1(clo_x, _c(0)))
            chi_l = jnp.where(at_start, _c(0), _sr1(chi_x, _c(0)))
            occ32 = occ.astype(jnp.int32)
            cnt_c = (r_ext - r_left) * occ32
            slo_c = (clo_x - clo_l) * occ32
            shi_c = (chi_x - chi_l) * occ32
            shx_hi, shx_lo = _split64(shi_c, 16)
            p_hi, p_lo = _add64(shx_hi, shx_lo, jnp.zeros_like(slo_c), slo_c)
            for r in (rkey, rmin, maxc, cnt_c):
                stg[0:18, :] = stg[0:18, :] + r
            s_hi, s_lo = _add64(stg[0:18, :], stg[0:18, :], p_hi, p_lo)
            stg[0:18, :] = s_lo
            acc = acc + stg[0, 0] + _sum_i32(s_hi[:1])
        if level == 5:   # dynamic row-major rotate + static full-width RMW
            from gpu_olap_tpu.ops.pallas.routing import _lane_iota, _sub_iota
            ls = f - fr * _c(LANES)
            for r in routed:
                r34 = jnp.concatenate(
                    [r, jnp.zeros((SR - 18, LANES), jnp.int32)], axis=0)
                y = pltpu.roll(r34, ls, 1)
                yb = pltpu.roll(y, _c(1), 0)
                y = jnp.where(_lane_iota(y.shape) >= ls, y, yb)
                y = pltpu.roll(y, fr, 0)
                stg[...] = stg[...] + y
            acc = acc + stg[0, 0]
        # bounded carry: f cycles in [0, 2040) so fr stays a valid offset
        scal[0] = jnp.where(f >= _c(2040), _c(0), f + (acc & _c(7)))
        out_ref[0] = acc

    grid = N // SB
    spec = pl.BlockSpec((RIN, LANES), lambda i: (i, np.int32(0)),
                        memory_space=pltpu.VMEM)

    def kern2(sk_ref, sv_ref, out_ref, hbm_ref, stg, scal, dsem):
        return kern(sk_ref, sv_ref, out_ref, stg, scal, hbm_ref, dsem)


    return pl.pallas_call(
        kern2, grid=(grid,),
        in_specs=[spec, spec],
        out_specs=[
            pl.BlockSpec((1,), lambda i: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4096, LANES), lambda i: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.MemorySpace.HBM)],
        out_shape=[jax.ShapeDtypeStruct((1,), jnp.int32),
                   jax.ShapeDtypeStruct((4096, LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((SR, LANES), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )


a2 = ks.reshape(N // LANES, LANES)
b2 = vs.reshape(N // LANES, LANES)
for lvl, name in [(8, "v8_scalreads"), (9, "v9_algebra")]:
    timeit(name, make_variant(lvl), a2, b2)


