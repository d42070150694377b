"""Shared Pallas TPU primitives: row-major shifts, prefix sums, emulated
64-bit pairs, and the monotone butterfly router.

TPUs have no vector scatter/gather, and XLA's scatter serializes — the
engine's kernels instead move data with *bit-serial butterfly routing*:
elements whose targets are monotone (group ranks, compaction slots, run
starts) shift left by their remaining delta one bit at a time, LSB first.
Monotone targets make every stage collision-free (Nassimi-Sahni
self-routing; verified by exhaustive simulation in round 3).  This replaces
the reference's CUDA atomics (``join_kernels.cuh:45-166``) for compaction,
segmented aggregation, and run-length expansion.

All arrays are (rows, 128) int32 tiles in row-major element order.  All
scalar literals are int32-typed (``_c``): under x64, bare Python ints trace
as weak i64 constants whose Mosaic conversion recurses infinitely on TPU.
"""

from __future__ import annotations

from ...utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

LANES = 128

_I32_MIN = np.int32(np.iinfo(np.int32).min)


def _c(v):
    """int32-typed constant (see module doc: weak-i64 Mosaic recursion)."""
    return np.int32(v)


def _u_lt(a, b):
    """Unsigned a < b on int32 lanes (bias by INT32_MIN flips the order)."""
    return (a ^ _I32_MIN) < (b ^ _I32_MIN)


def _add64(hi1, lo1, hi2, lo2):
    """(hi1,lo1) + (hi2,lo2) as emulated int64 over int32 pairs (wrapping
    low add + unsigned carry detection).  Element-wise or scalar."""
    lo = lo1 + lo2
    carry = _u_lt(lo, lo2).astype(jnp.int32)
    return hi1 + hi2 + carry, lo


def _split64(hi_small, shift):
    """(value << shift) of a small int32 as a (hi, lo) int32 pair."""
    if shift == 0:
        return (hi_small >> np.int32(31)), hi_small  # sign-extend
    return (hi_small >> np.int32(32 - shift)), (hi_small << np.int32(shift))


def _sum_i32(x):
    """Scalar int32 sum of a 2-D tile.  Axis-wise reductions with an explicit
    int32 dtype: a full scalar reduce proxies through jnp.sum WITHOUT the
    dtype override, which promotes int32 -> int64 under x64 (unloweraable)."""
    rows = jnp.sum(x, axis=1, dtype=jnp.int32, keepdims=True)   # (rows, 1)
    return jnp.sum(rows.reshape(1, x.shape[0]), axis=1,
                   dtype=jnp.int32)[0]


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _sub_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _pos_iota(rows):
    """Row-major slot index over a (rows, 128) tile."""
    s = (rows, LANES)
    return _sub_iota(s) * LANES + _lane_iota(s)


def _shift_left(x, s):
    """Row-major left shift: out[i] = x[i + s] (wrap at the tail — callers
    mask).  Lane part + row-crossing fix, then sublane part."""
    rows = x.shape[0]
    ls, rs = s % LANES, s // LANES
    y = x
    if ls:
        y = pltpu.roll(y, np.int32(LANES - ls), 1)
        yb = pltpu.roll(y, np.int32(rows - 1), 0)
        y = jnp.where(_lane_iota(x.shape) < _c(LANES - ls), y, yb)
    if rs:
        y = pltpu.roll(y, np.int32(rows - rs), 0)
    return y


def _shift_right1(x, fill00):
    """Row-major right shift by one: out[i] = x[i-1], out[0] = fill00."""
    yl = pltpu.roll(x, np.int32(1), 1)                 # out[r, c] = x[r, c-1 mod 128]
    yb = pltpu.roll(yl, np.int32(1), 0)                # out[r, 0] = x[r-1, 127]
    lane = _lane_iota(x.shape)
    y = jnp.where(lane == _c(0), yb, yl)
    pos = _pos_iota(x.shape[0])
    return jnp.where(pos == _c(0), fill00, y)


def _cumsum_flat(x):
    """Row-major inclusive prefix sum over a (rows, 128) int32 tile:
    7 lane-doubling steps + sublane-doubling row offsets."""
    lane = _lane_iota(x.shape)
    y = x
    for k in (1, 2, 4, 8, 16, 32, 64):
        y = y + jnp.where(lane >= _c(k), pltpu.roll(y, np.int32(k), 1), _c(0))
    rt = y[:, LANES - 1:LANES]               # (rows, 1) row totals
    sub = _sub_iota(rt.shape)
    z = rt
    k = 1
    while k < x.shape[0]:
        z = z + jnp.where(sub >= _c(k), pltpu.roll(z, np.int32(k), 0), _c(0))
        k *= 2
    return y + (z - rt)                      # add exclusive row offsets


def _fill_forward(x, filled):
    """Row-major forward fill: each empty slot takes the nearest filled slot
    to its LEFT.  ``filled`` is bool; empty slots of x must be anything.
    Doubling: log2(slots) steps.  Slot 0, if empty, stays as-is."""
    rows = x.shape[0]
    n = rows * LANES
    f32 = filled.astype(jnp.int32)
    k = 1
    while k < n:
        xs = _shift_rightk(x, k)
        fs = _shift_rightk(f32, k)
        take = (f32 == _c(0)) & (fs != _c(0))
        x = jnp.where(take, xs, x)
        f32 = jnp.where(take, fs, f32)
        k *= 2
    return x


def _shift_rightk(x, s):
    """Row-major right shift by s: out[i] = x[i - s] (wrap at head — callers
    mask or rely on fill semantics)."""
    rows = x.shape[0]
    ls, rs = s % LANES, s // LANES
    y = x
    if ls:
        y = pltpu.roll(y, np.int32(ls), 1)
        yb = pltpu.roll(y, np.int32(1), 0)
        y = jnp.where(_lane_iota(x.shape) >= _c(ls), y, yb)
    if rs:
        y = pltpu.roll(y, np.int32(rs), 0)
    return y


def route_left(d, streams, stages, msb_first=False):
    """Bit-serial butterfly: elements (occupied slots, d >= 0) move LEFT by
    their remaining delta.  Monotone targets make it collision-free
    (verified by exhaustive simulation) — but bit ORDER depends on regime:

    * LSB-first (default) for COMPACTION: deltas nondecreasing in position
      (dense targets, spread sources);
    * MSB-first for EXPANSION: deltas nonincreasing (dense sources, spread
      targets).  The wrong order collides in the other regime.

    Vacated slots become 0 / -1; wrap-ins from the tail are masked.
    ``d``: (rows, 128) int32 — remaining left-distance, -1 marks empty.
    ``streams``: list of same-shape int32 arrays that ride along.
    """
    rows = d.shape[0]
    nslot = rows * LANES
    pos = _pos_iota(rows)
    order = range(stages - 1, -1, -1) if msb_first else range(stages)
    for k in order:
        b = 1 << k
        mover = (d >= _c(0)) & ((d & _c(b)) != _c(0))
        src_ok = pos < _c(nslot - b)
        inc = _shift_left(mover.astype(jnp.int32), b)
        inc = (inc != _c(0)) & src_ok
        d_in = _shift_left(d, b) - _c(b)
        d = jnp.where(inc, d_in, jnp.where(mover, _c(-1), d))
        out = []
        for s_ in streams:
            sh = _shift_left(s_, b)
            out.append(jnp.where(inc, sh, jnp.where(mover, _c(0), s_)))
        streams = out
    return streams
