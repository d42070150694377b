"""Pallas TPU kernel: fused filter + global aggregation.

The reference JITs a per-predicate CUDA filter kernel that writes a bitmask
(``codegen.rs:36-47``) followed by separate aggregation kernels
(``filter_kernel.rs:1-5``, ``aggregate_kernel.rs``).  This Pallas kernel fuses
the whole ``WHERE <col> <cmp> <lit> -> COUNT/SUM/MIN/MAX/AVG`` pipeline into
ONE pass over HBM: the grid walks row blocks, Pallas double-buffers the
HBM->VMEM block loads automatically, and the VPU computes the mask and
per-block partial reductions in registers.  The TPU grid is sequential, so
partials accumulate directly into SMEM output scalars — no partial arrays,
no second XLA reduction over them.

Single pass, 4 bytes read per row per column, no intermediate mask
materialization: the speed-of-light shape for BASELINE config 1.

Exactness: block SUM partials are computed on a two-field signed 16-bit
decomposition of each int32 value (``lo = v & 0xFFFF`` unsigned,
``hi = v >> 16`` sign-carrying) over 2048-rows-per-lane blocks — each lane's
block sum is bounded by ``2048 * 65535 < 2^31`` so it fits int32 — and folded
into an emulated (hi, lo) int32 pair with wrap-around carry detection.  No
64-bit ops run on the VPU (Mosaic has no 64-bit support); the exact int64 is
reassembled outside the kernel.
"""

from __future__ import annotations

import functools

from ...utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from .seg_agg import _add64, _split64  # emulated-64-bit scalar helpers

# rows per grid step; (BLOCK // 128) x 128 vector tiles of int32.  Bigger
# blocks = fewer sequential-grid steps (~0.7 us each) and longer DMA bursts,
# but every input stream is double-buffered in VMEM and the TPU's SCOPED
# VMEM LIMIT IS 16 MB (measured on v5e: a 24 MB allocation is rejected at
# compile time) — so the block size is budgeted per stream count below.
_VMEM_BUDGET = 14 * 1024 * 1024   # scoped-vmem budget (limit is 16 MB)
_TEMPS = 3                        # live block-sized VPU temporaries on the
#                                   scoped stack (mask + masked-value
#                                   splits).  Calibrated against hardware:
#                                   2 streams @ 512K rows compiles (smoke),
#                                   1 stream @ 1M rows exceeds 16 MB by 2 KB
_BLOCK_MIN = 256 * 1024
_LANES = 128
#: engagement threshold for the SQL matcher — below this XLA's fused reduce
#: wins on kernel-dispatch overhead alone (inputs are padded up to a block)
MIN_ROWS = 64 * 1024


def _block_rows(n_streams: int) -> int:
    """Largest power-of-2 row block fitting the scoped-VMEM budget: each
    input stream is double-buffered and the kernel body keeps ~_TEMPS
    block-sized int32 temporaries live on the same scoped stack."""
    rows = _VMEM_BUDGET // ((n_streams * 2 + _TEMPS) * 4)
    return max(_BLOCK_MIN, 1 << (rows.bit_length() - 1)) if rows else _BLOCK_MIN


def fits_vmem(n_streams: int) -> bool:
    """True when ``n_streams`` double-buffered blocks + temporaries fit the
    scoped-VMEM budget at the minimum block size.  Wide aggregates (many
    distinct value columns) that don't fit must take the XLA mask path —
    the Mosaic compile of an over-budget kernel is REJECTED on TPU, which
    would fail the whole query program (ADVICE r4 #1)."""
    return (n_streams * 2 + _TEMPS) * 4 * _BLOCK_MIN <= _VMEM_BUDGET

_I32_MAX = np.int32(np.iinfo(np.int32).max)
_I32_MIN = np.int32(np.iinfo(np.int32).min)

#: comparison op -> vector predicate (static at trace time)
_CMP = {
    "gt": lambda v, t: v > t,
    "ge": lambda v, t: v >= t,
    "lt": lambda v, t: v < t,
    "le": lambda v, t: v <= t,
    "eq": lambda v, t: v == t,
    "ne": lambda v, t: v != t,
}


def _sum_i32(vec):
    """Scalar int32 sum.  Reduce a (1, n) view over axis 1 so the output aval
    is non-scalar: Mosaic's scalar-reduce lowering re-enters ``jnp.sum``
    WITHOUT a dtype override, and under x64 that promotes int32 -> int64,
    which Mosaic cannot lower."""
    n = vec.shape[0]
    return jnp.sum(vec.reshape(1, n), axis=1, dtype=jnp.int32)[0]


def _pad_to_block(a, block):
    n = a.shape[0]
    n_pad = -(-n // block) * block
    if n_pad != n:
        a = jnp.concatenate([a, jnp.zeros(n_pad - n, dtype=a.dtype)])
    return a, n_pad


def _filter_agg_kernel(op: str, n_cols: int, wants, alias, block: int,
                       thresh_ref, nvalid_ref, filt_ref, *rest):
    """One row block: mask from the predicate, then fold per-block partials
    into (1, 128) VECTOR lane accumulators — COUNT plus, per value column,
    an emulated int64 SUM and MIN/MAX.  Everything is vector-shaped (the
    scalar-accumulator variant serialized ~10 full-vector reductions per
    block and ran 2x slower than XLA's fused reduce); the final 128-lane
    fold happens outside in XLA.

    ``alias[k]`` marks value columns that ARE the filter column: they read
    the already-loaded filter block instead of a second HBM stream (the
    ``SUM(v) WHERE v > c`` flagship halves its traffic).  The row-validity
    bound applies per-element only in the single block that straddles
    ``n_valid`` — full blocks skip the index arithmetic entirely (~3 VPU
    ops/row on a ~10-op/row kernel)."""
    rows = block // _LANES
    n_in = sum(1 for a in alias if not a)
    col_refs = rest[:n_in]
    outs = rest[n_in:]
    cnt_ref = outs[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        zero = jnp.zeros((1, _LANES), jnp.int32)
        cnt_ref[...] = zero
        for k in range(n_cols):
            shi, slo, mn, mx = outs[1 + 4 * k: 5 + 4 * k]
            shi[...] = zero
            slo[...] = zero
            mn[...] = jnp.full((1, _LANES), _I32_MAX, jnp.int32)
            mx[...] = jnp.full((1, _LANES), _I32_MIN, jnp.int32)

    f = filt_ref[:].reshape(rows, _LANES)
    base = _CMP[op](f, thresh_ref[0])

    def col_sum(x):  # (rows, LANES) int32 -> (1, LANES) partial
        return jnp.sum(x, axis=0, keepdims=True, dtype=jnp.int32)

    def accumulate(mask):
        cnt_ref[...] = cnt_ref[...] + col_sum(mask.astype(jnp.int32))
        j = 0
        for k in range(n_cols):
            if alias[k]:
                v = f
            else:
                v = col_refs[j][:].reshape(rows, _LANES)
                j += 1
            want = wants[k]
            want_sum, want_minmax = want[0], want[1]
            sum16 = len(want) > 2 and want[2]
            shi, slo, mn, mx = outs[1 + 4 * k: 5 + 4 * k]
            if want_sum and sum16:
                # zone maps prove |v| < 2^15: the per-lane block sum
                # (<= rows * 32767 < 2^31) is exact in ONE int32 reduce —
                # drops the lo/hi split (a reduce + 2 VPU ops per row)
                mv = jnp.where(mask, v, np.int32(0))
                s = col_sum(mv)
                hi, lo = _add64(shi[...], slo[...], *_split64(s, 0))
                shi[...] = hi
                slo[...] = lo
            elif want_sum:
                mv = jnp.where(mask, v, np.int32(0))
                # signed 16-bit decomposition: v == lo + (hi << 16) with lo
                # unsigned and hi arithmetic-shifted (sign-carrying); per-lane
                # block sums (<= rows*65535 and rows*32768) fit int32
                s0 = col_sum(mv & np.int32(0xFFFF))
                s1 = col_sum(mv >> np.int32(16))
                hi, lo = _add64(shi[...], slo[...], jnp.zeros_like(s0), s0)
                hi, lo = _add64(hi, lo, *_split64(s1, 16))
                shi[...] = hi
                slo[...] = lo
            if want_minmax:
                mn[...] = jnp.minimum(
                    mn[...], jnp.min(jnp.where(mask, v, _I32_MAX),
                                     axis=0, keepdims=True))
                mx[...] = jnp.maximum(
                    mx[...], jnp.max(jnp.where(mask, v, _I32_MIN),
                                     axis=0, keepdims=True))

    # blocks fully inside [0, n_valid) skip the per-element index bound
    full = nvalid_ref[0] >= (i + np.int32(1)) * np.int32(block)

    @pl.when(full)
    def _():
        accumulate(base)

    @pl.when(jnp.logical_not(full))
    def _():
        # flat row index of element (r, c) is i*block + r*128 + c (row-major)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        idx = i * np.int32(block) + r2 * np.int32(_LANES) + c2
        accumulate(base & (idx < nvalid_ref[0]))


def filter_agg_i32(filt: jnp.ndarray, op: str, threshold, cols,
                   n_cols: int, interpret: bool = False, n_valid=None,
                   wants=None):
    """Fused ``WHERE filt <op> threshold`` global aggregation over int32 lanes.

    ``filt``: (n,) int32 filter column.  ``op``: one of gt/ge/lt/le/eq/ne.
    ``cols``: tuple of ``n_cols`` int32 (n,) value columns (may alias filt —
    aliased columns ride the filter's block load, halving HBM traffic for
    the ``SUM(v) WHERE v > c`` flagship).
    ``n_valid``: number of leading non-padding rows (traced OK; defaults n).
    ``wants``: static per-column ``(want_sum, want_minmax[, sum16_ok])``
    tuples — unneeded lanes cost VPU ops per row, so callers drop them
    (default: all on).  ``sum16_ok``: the caller's statistics prove
    |value| < 2^15, enabling the single-reduce exact sum.

    Returns ``(count_i64, [(sum_i64, min_i32, max_i32), ...])`` with one
    triple per value column.  min/max are sentinel (INT32_MAX/MIN) when no
    row matches — callers gate on count like the XLA global path does;
    un-wanted lanes hold their identities (0 / sentinels).
    """
    # alias detection by object identity must happen OUTSIDE the jit below:
    # pytree flattening gives duplicated leaves distinct tracers inside
    alias = tuple(c is filt for c in cols)
    distinct = tuple(c for c, a in zip(cols, alias) if not a)
    return _filter_agg_impl(filt, op, threshold, distinct, n_cols, interpret,
                            n_valid, wants, alias)


@functools.partial(jax.jit, static_argnums=(1, 4, 5, 7, 8))
def _filter_agg_impl(filt, op: str, threshold, distinct, n_cols: int,
                     interpret: bool, n_valid, wants, alias):
    if wants is None:
        wants = ((True, True),) * n_cols
    n = filt.shape[0]
    if n_valid is None:
        n_valid = n
    block = _block_rows(1 + len(distinct))
    if n < 4 * block:
        block = _BLOCK_MIN  # bound padding waste on small inputs
    filt, n_pad = _pad_to_block(filt, block)
    distinct = tuple(_pad_to_block(c, block)[0] for c in distinct)
    grid = n_pad // block

    blk = pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM)
    # full-array blocks + explicit int32-zero index maps: the auto-generated
    # index map of an UNBLOCKED spec returns a weak-i64 constant under x64,
    # which the Mosaic pass pipeline refuses (func.return i64)
    scalar = pl.BlockSpec((1,), lambda i: (np.int32(0),),
                          memory_space=pltpu.SMEM)
    acc = pl.BlockSpec((1, _LANES), lambda i: (np.int32(0), np.int32(0)),
                       memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_filter_agg_kernel, op, n_cols, wants, alias, block),
        grid=(grid,),
        in_specs=[scalar, scalar, blk] + [blk] * len(distinct),
        out_specs=[acc] * (1 + 4 * n_cols),
        out_shape=[jax.ShapeDtypeStruct((1, _LANES), jnp.int32)
                   for _ in range(1 + 4 * n_cols)],
        interpret=interpret,
    )(jnp.asarray([threshold], dtype=jnp.int32),
      jnp.asarray([n_valid], dtype=jnp.int32), filt, *distinct)

    # final 128-lane fold in XLA (tiny)
    count = jnp.sum(outs[0].astype(jnp.int64))
    results = []
    for k in range(n_cols):
        shi, slo, mn, mx = outs[1 + 4 * k: 5 + 4 * k]
        lane64 = (shi.astype(jnp.int64) << 32) | (
            slo.astype(jnp.int64) & 0xFFFFFFFF)
        results.append((jnp.sum(lane64), jnp.min(mn), jnp.max(mx)))
    return count, results


def filter_count_sum_i32(values: jnp.ndarray, threshold, n_valid) -> tuple:
    """Fused ``COUNT(*), SUM(v) WHERE v > threshold`` over an int32 column
    (single column aliased as both filter and aggregate input)."""
    count, ((total, _mn, _mx),) = filter_agg_i32(
        values, "gt", threshold, (values,), 1, False, n_valid)
    return count, total.astype(jnp.float64)


def filter_count_sum_exact_i32(values: jnp.ndarray, threshold, n_valid):
    """Exact int64 ``COUNT/SUM WHERE v > c`` for int32 values."""
    count, ((total, _mn, _mx),) = filter_agg_i32(
        values, "gt", threshold, (values,), 1, False, n_valid)
    return count, total
