"""Pallas TPU kernels for the sorted-space join pipeline.

The reference's radix hash join emits (probe, build) pairs with atomicAdd
match counters (``join_kernels.cuh:115-166``).  The TPU engine's round-1/2
replacement used ``jnp.repeat`` + capacity-sized random gathers, both of
which serialize or issue-bind on TPU (measured ~90M gathered elements/s —
the whole honest 25Mx25M join ran at 8.4M rows/s).

This module provides the two streaming kernels that replace them:

* ``stream_compact_i32`` — dense prefix of masked elements (N streams ride
  one butterfly).  Extracts probe match records and build row ids from the
  tagged co-sort in one pass — no compaction sorts.
* ``expand_fill_i32`` — run-length expansion: records (start, ...) decode
  into capacity-sized per-slot streams by routing records to their output
  run starts and forward-filling.  Replaces ``jnp.repeat``'s hidden
  scatter-add; the emitted build positions are nearly monotone, so the
  downstream value gathers walk HBM nearly sequentially.

Both walk the sequential TPU grid with carried SMEM state; all data
movement is butterfly routing + contiguous DMA (see ``routing.py``).
"""

from __future__ import annotations

import functools

from ...utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from .routing import (  # noqa: E402
    LANES, _c, _cumsum_flat, _fill_forward, _pos_iota, _sum_i32, route_left)

RIN = 16                    # rows per grid step
SB = RIN * LANES            # 2048 elements per grid step
DR = 18                     # compact routing domain rows (2 pad + 16)
SR = 34                     # compact staging rows
FLUSH = 16                  # staging rows per flush (2048 elements)

I32MAX = np.int32(np.iinfo(np.int32).max)


# ======================================================================
# stream compaction
# ======================================================================

def _compact_kernel(nstr, mask_ref, *rest):
    ins = rest[:nstr]
    outs = rest[nstr:2 * nstr]
    ocnt = rest[2 * nstr]
    stg = rest[2 * nstr + 1:3 * nstr + 1]
    scal = rest[3 * nstr + 1]
    sems = rest[3 * nstr + 2]
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)
    cap_rows = outs[0].shape[0]

    @pl.when(i == _c(0))
    def _():
        for g in stg:
            g[...] = jnp.zeros((SR, LANES), jnp.int32)
        scal[0] = _c(0)   # f: staging fill
        scal[1] = _c(0)   # flushed elements

    f = scal[0]
    gw = scal[1]

    m32 = mask_ref[...]
    pos16 = _pos_iota(RIN)
    incl = _cumsum_flat(m32)
    d_blk = _sum_i32(m32)

    fr = f // _c(LANES)
    relf = f - fr * _c(LANES)
    m = m32 != _c(0)
    tgt = relf + incl - _c(1)                # in [relf, relf + d)
    delta = (pos16 + _c(2 * LANES)) - tgt
    d_arr = jnp.concatenate([jnp.full((2, LANES), -1, jnp.int32),
                             jnp.where(m, delta, _c(-1))], axis=0)
    lifted = [jnp.concatenate([jnp.zeros((2, LANES), jnp.int32),
                               jnp.where(m, s_ref[...], _c(0))], axis=0)
              for s_ref in ins]
    routed = route_left(d_arr, lifted, 12)

    win = pl.ds(fr, DR)
    for g, r in zip(stg, routed):
        g[win, :] = g[win, :] + r

    f_new = f + d_blk

    def _flush(gw_now):
        dst = jnp.minimum(gw_now // _c(LANES), _c(cap_rows - FLUSH))
        for j, (g, o) in enumerate(zip(stg, outs)):
            pltpu.make_async_copy(g.at[0:FLUSH, :],
                                  o.at[pl.ds(dst, FLUSH), :],
                                  sems.at[np.int32(j)]).start()
        for j, (g, o) in enumerate(zip(stg, outs)):
            pltpu.make_async_copy(g.at[0:FLUSH, :],
                                  o.at[pl.ds(dst, FLUSH), :],
                                  sems.at[np.int32(j)]).wait()

    @pl.when(f_new >= _c(FLUSH * LANES))
    def _():
        _flush(gw)
        for g in stg:
            kept = g[FLUSH:SR, :]
            g[0:SR - FLUSH, :] = kept
            g[SR - FLUSH:SR, :] = jnp.zeros((FLUSH, LANES), jnp.int32)
        scal[1] = gw + _c(FLUSH * LANES)

    scal[0] = jnp.where(f_new >= _c(FLUSH * LANES),
                        f_new - _c(FLUSH * LANES), f_new)

    @pl.when(i == _c(nsteps - 1))
    def _():
        _flush(scal[1])
        ocnt[0] = scal[1] + scal[0]


def stream_compact_i32(mask, streams, cap: int, interpret: bool = False):
    """Dense prefix extraction: for every position where ``mask`` is nonzero,
    write each stream's value to the next free output slot (stable order).

    ``mask``: (n,) int32/bool, n % 2048 == 0.  ``streams``: int32 (n,) each.
    Returns ([compacted (cap_pad,) per stream], count_i32) — entries beyond
    count are garbage; if count > cap trailing entries are dropped (writes
    clamp into tail headroom) but count stays exact.
    """
    n = mask.shape[0]
    assert n % SB == 0, n
    grid = n // SB
    nstr = len(streams)
    cap_rows = -(-cap // LANES) + 2 * FLUSH

    out_hbm = pl.BlockSpec((cap_rows, LANES),
                           lambda i: (np.int32(0), np.int32(0)),
                           memory_space=pltpu.MemorySpace.HBM)
    in_spec = pl.BlockSpec((RIN, LANES), lambda i: (i, np.int32(0)),
                           memory_space=pltpu.VMEM)
    kernel = pl.pallas_call(
        functools.partial(_compact_kernel, nstr),
        grid=(grid,),
        in_specs=[in_spec] * (1 + nstr),
        out_specs=[out_hbm] * nstr + [
            pl.BlockSpec((1,), lambda i: (np.int32(0),),
                         memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((cap_rows, LANES), jnp.int32)
                   for _ in range(nstr)] + [
                       jax.ShapeDtypeStruct((1,), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((SR, LANES), jnp.int32)
                        for _ in range(nstr)]
        + [pltpu.SMEM((2,), jnp.int32), pltpu.SemaphoreType.DMA((nstr,))],
        interpret=interpret,
    )
    res = kernel(mask.astype(jnp.int32).reshape(grid * RIN, LANES),
                 *[s.reshape(grid * RIN, LANES) for s in streams])
    outs, cnt = res[:nstr], res[nstr]
    return [o.reshape(-1) for o in outs], cnt[0]


# ======================================================================
# run-length expansion (the pair-emission decode)
# ======================================================================

EWIN = 24                   # record window rows per step (3072 records);
                            # multiple of 8 (VMEM sublane tiling)
EDR = RIN + EWIN            # routing domain rows: 16 targets + 24 sources

def _expand_kernel(nstr, starts_hbm, *rest):
    ins_hbm = rest[:nstr]
    o_off = rest[nstr]
    o_str = rest[nstr + 1:2 * nstr + 1]
    w_all = rest[2 * nstr + 1:3 * nstr + 2]      # windows: starts + streams
    scal = rest[3 * nstr + 2]
    sems = rest[3 * nstr + 3]
    i = pl.program_id(0)

    @pl.when(i == _c(0))
    def _():
        scal[0] = _c(0)           # rp: records consumed (start < base)
        for j in range(nstr + 1):
            scal[1 + j] = _c(0)   # active-record carry (start, streams...)

    rp = scal[0]
    base = i * _c(SB)
    bend = base + _c(SB)

    # ---- DMA the record window [rowbase, rowbase + EWIN) rows ----------
    rowbase = rp // _c(LANES)
    srcs = [starts_hbm] + list(ins_hbm)
    for j, (h, w) in enumerate(zip(srcs, w_all)):
        pltpu.make_async_copy(h.at[pl.ds(rowbase, EWIN), :], w,
                              sems.at[np.int32(j)]).start()
    for j, (h, w) in enumerate(zip(srcs, w_all)):
        pltpu.make_async_copy(h.at[pl.ds(rowbase, EWIN), :], w,
                              sems.at[np.int32(j)]).wait()

    st = w_all[0][...]                        # (EWIN, 128) record starts
    pos_w = _pos_iota(EWIN) + rowbase * _c(LANES)   # global record index
    in_blk = (pos_w >= rp) & (st < bend)
    live = in_blk & (st >= base)
    consumed = _sum_i32(in_blk.astype(jnp.int32))

    # ---- route live records to their run-start slots --------------------
    # domain: target slots in rows [0, RIN), window sources above them
    pad_rows = EDR - EWIN                     # 18: sources sit past targets
    src_pos = _pos_iota(EWIN) + _c(pad_rows * LANES)
    tgt = st - base                           # in [0, SB) for live records
    delta = src_pos - tgt
    d_arr = jnp.concatenate([
        jnp.full((pad_rows, LANES), -1, jnp.int32),
        jnp.where(live, delta, _c(-1))], axis=0)
    lifted = [jnp.concatenate([jnp.zeros((pad_rows, LANES), jnp.int32),
                               jnp.where(live, w[...], _c(0))], axis=0)
              for w in w_all]
    marker = jnp.concatenate([jnp.zeros((pad_rows, LANES), jnp.int32),
                              live.astype(jnp.int32)], axis=0)
    routed = route_left(d_arr, lifted + [marker], 13, msb_first=True)
    filled = routed[-1][:RIN, :] != _c(0)
    vals = [r[:RIN, :] for r in routed[:-1]]

    # carry-in: slot 0 belongs to the still-open record unless one starts
    # exactly there
    pos16 = _pos_iota(RIN)
    at0 = pos16 == _c(0)
    vals = [jnp.where(at0 & jnp.logical_not(filled), scal[1 + j], v)
            for j, v in enumerate(vals)]
    filled0 = filled | at0
    fvals = [_fill_forward(v, filled0) for v in vals]

    o_off[...] = (pos16 + base) - fvals[0]    # slot offset within its run
    for o, v in zip(o_str, fvals[1:]):
        o[...] = v

    # ---- carries ---------------------------------------------------------
    # scalar reads go through REFS (computed-vreg extracts fault Mosaic):
    # start_f is recoverable from the off output, streams from their outs
    scal[0] = rp + consumed
    scal[1] = (base + _c(SB - 1)) - o_off[RIN - 1, LANES - 1]
    for j in range(nstr):
        scal[2 + j] = o_str[j][RIN - 1, LANES - 1]


def expand_fill_i32(starts, streams, cap: int, interpret: bool = False):
    """Run-length decode of match records into per-slot streams.

    ``starts``: (m,) int32, m % 2048 == 0 — strictly increasing output run
    starts of live records, with starts[0] == 0 when any record exists; pad
    records must be INT32_MAX.  ``streams``: (m,) int32 values replicated
    across each record's run.  ``cap`` % 2048 == 0: output length.

    Returns [off, fill(stream)...]: ``off`` is each slot's offset inside its
    record's run (e.g. build position = lo_fill + off).  Slots past the true
    total (= next start after the last live record) replicate the last
    record — callers mask with their own total.

    The record arrays must have >= 2304 sentinel entries past the last slot
    the read window can touch (m >= records + 2304).
    """
    m = starts.shape[0]
    assert m % SB == 0 and cap % SB == 0
    grid = cap // SB
    nstr = len(streams)
    rows_in = m // LANES

    out_spec = pl.BlockSpec((RIN, LANES), lambda i: (i, np.int32(0)),
                            memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec((rows_in, LANES),
                       lambda i: (np.int32(0), np.int32(0)),
                       memory_space=pltpu.MemorySpace.HBM)
    kernel = pl.pallas_call(
        functools.partial(_expand_kernel, nstr),
        grid=(grid,),
        in_specs=[hbm] * (1 + nstr),
        out_specs=[out_spec] * (nstr + 1),
        out_shape=[jax.ShapeDtypeStruct((grid * RIN, LANES), jnp.int32)
                   for _ in range(nstr + 1)],
        scratch_shapes=[pltpu.VMEM((EWIN, LANES), jnp.int32)
                        for _ in range(nstr + 1)]
        + [pltpu.SMEM((2 + nstr,), jnp.int32),
           pltpu.SemaphoreType.DMA((nstr + 1,))],
        interpret=interpret,
    )
    res = kernel(starts.reshape(rows_in, LANES),
                 *[s.reshape(rows_in, LANES) for s in streams])
    return [r.reshape(-1) for r in res]
