"""Pallas TPU kernel: post-sort segmented aggregation (the group-by hot path).

The reference's CUDA hash aggregate is an atomicAdd shared-memory table
(``join_kernels.cuh:216-240``, ``aggregate_kernel.rs:1-8``).  The TPU engine
first sorts (key, value) with ``lax.sort`` — that part is near XLA's floor —
but the XLA *post-sort* pipeline (run flags, group-id cumsum, a second
boundary-compaction sort, per-aggregate 64-bit cumsums, boundary gathers)
costs ~5x the sort itself.  This kernel replaces all of it with ONE pass over
the sorted lanes:

* the sequential TPU grid walks superblocks of ``SB`` rows; inside, chunks of
  ``CHUNK`` rows are processed with vector ops;
* per chunk, segment membership one-hot matrices hit the MXU:
  COUNT/SUM partials via membership @ 12-bit value splits (each partial
  <= 2^21 so f32 accumulation is exact), group key / MIN / MAX via one-hot
  boundary gathers of 16-bit splits (single product, exact);
* MIN/MAX exploit the ride-the-sort invariant (value is the second sort key,
  so within a group values ascend: min = first row, max = last row);
* the group whose run spans a chunk/superblock boundary is carried in 64-bit
  emulated (hi, lo) int32 pairs with wrap-around carry detection — no 64-bit
  VPU ops;
* each group's outputs are written exactly once, when its run ends, into a
  VMEM staging window that is DMA'd to HBM once per superblock.

Reads 8 bytes per row, writes ~6 x 4 bytes per group.  Padding rows must be
pre-masked to key = INT32_MAX (they sort last and form one trailing sentinel
group the caller drops).
"""

from __future__ import annotations

import functools

from ...utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

CHUNK = 512                 # rows per inner iteration (one-hot tile edge)
CPS = 64                    # chunks per superblock (grid step)
SB = CHUNK * CPS            # rows per grid step
SBW = SB + 2 * CHUNK        # staging/DMA window: SB flags + spanning group,
                            # rounded to a 1024 tile multiple (33 x 1024)

_I32_MIN = np.int32(np.iinfo(np.int32).min)


def _u_lt(a, b):
    """Unsigned a < b on int32 lanes (bias by INT32_MIN flips the order)."""
    return (a ^ _I32_MIN) < (b ^ _I32_MIN)


def _add64(hi1, lo1, hi2, lo2):
    """(hi1,lo1) + (hi2,lo2) as emulated int64 over int32 pairs (wrapping
    low add + unsigned carry detection).  Works element-wise or on scalars."""
    lo = lo1 + lo2
    carry = _u_lt(lo, lo1).astype(jnp.int32)
    return hi1 + hi2 + carry, lo


def _split64(hi_small, shift):
    """(value << shift) of a small int32 as a (hi, lo) int32 pair."""

    def f(v):
        if shift == 0:
            return (v >> 31), v  # sign-extend
        return (v >> (32 - shift)), (v << shift)

    return f(hi_small)


def _roll1d(x, shift):
    """Wrapping roll of a 1D vector.  Mosaic's ``tpu.dynamic_rotate`` only
    lowers for >=2D shapes, so roll a (1, n) view along axis 1."""
    n = x.shape[0]
    return pltpu.roll(x.reshape(1, n), shift, 1).reshape(n)


def _prefix_sum_i32(x):
    """Inclusive prefix sum of an int32 vector — log-step shift-adds
    (``cumsum`` has no Pallas TPU lowering)."""
    n = x.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    d = 1
    while d < n:
        sh = _roll1d(x, np.int32(d))  # sh[i] = x[i - d] (wrapping)
        x = x + jnp.where(iota >= np.int32(d), sh, np.int32(0))
        d *= 2
    return x


def _sum_i32(vec_i32):
    """Scalar int32 sum of a vector.  Reduce a (1, n) view over axis 1 so the
    output aval is (1,): Mosaic's scalar-reduce lowering wraps the op in a
    proxy that re-enters ``jnp.sum`` WITHOUT the dtype override, and under
    x64 that promotes int32 -> int64, which Mosaic cannot lower."""
    n = vec_i32.shape[0]
    return jnp.sum(vec_i32.reshape(1, n), axis=1, dtype=jnp.int32)[0]


def _onehot_extract(vec_i32, idx):
    """vec[idx] via a masked integer reduction (no dynamic vector indexing)."""
    n = vec_i32.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    return _sum_i32(jnp.where(iota == idx, vec_i32, np.int32(0)))


#: RMW window width for dynamic-offset stores: loads/stores must sit at
#: 1024-aligned (8x128 int32 tile) offsets, so a CHUNK-wide write at an
#: arbitrary offset becomes a masked merge into a 2-tile aligned window.
_W = 2048


def _store_window(ref, off, vec):
    """``ref[off:off+CHUNK] = vec`` for an arbitrary traced ``off`` into a 1D
    staging buffer (one buffer per output lane: slicing a lane out of a 2D
    scratch violates the 8-sublane tiling for DMA sources).

    Mosaic vector stores require tile-aligned (1024 int32) dynamic offsets;
    this reads the aligned ``_W``-wide window covering the target range,
    rotates ``vec`` into position (tpu.dynamic_rotate), merges under a mask,
    and stores the window back."""
    base = pl.multiple_of((off // np.int32(1024)) * np.int32(1024), 1024)
    place = off - base  # 0..1023
    # all vector work in (1, n) 2D space: Mosaic's 1D concatenate rejects
    # non-tile-aligned part offsets and 1D dynamic_rotate has no lowering
    w = ref[pl.ds(base, _W)].reshape(1, _W)
    padded = jnp.concatenate(
        [vec.reshape(1, CHUNK), jnp.zeros((1, _W - CHUNK), vec.dtype)], axis=1)
    rotated = pltpu.roll(padded, place, 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (1, _W), 1)
    mask = (iota_w >= place) & (iota_w < place + np.int32(CHUNK))
    ref[pl.ds(base, _W)] = jnp.where(mask, rotated, w).reshape(_W)


def _seg_agg_kernel(keys_ref, vals_ref,
                    key_out, cnt_out, shi_out, slo_out, mn_out, mx_out,
                    counts_out,
                    st_key, st_cnt, st_shi, st_slo, st_mn, st_mx,
                    smem, sems):
    """One superblock.  Superblock ``i`` DMAs its finalized groups to its OWN
    aligned region ``out[i*SBW : (i+1)*SBW]`` and records how many in
    ``counts_out[i]`` — HBM DMA destinations must sit at provably
    1024-tile-aligned offsets, so a running global offset cannot be used;
    one cheap XLA gather compacts the regions afterwards.

    smem layout (int32):
    1: open_cnt   2: open_sum_hi  3: open_sum_lo
    4: open_min   5: open_max     6: open_key
    7: prev_key   8: prev_val     (last row of the previous superblock)
    """
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(i == 0)
    def _():
        for s in range(9):
            smem[s] = 0

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK,), 0)
    # membership column ids: column s holds segment s+1
    seg_cols = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0) + 1

    def lead0(scalar, rolled):
        return jnp.where(iota_c == 0, scalar, rolled)

    def half_chunk(k, v, kp, vp, is_first, carry):
        (ocnt, oshi, oslo, omin, omax, okey, olocal) = carry
        flags = k != kp
        if is_first is not None:
            flags = flags | ((iota_c == 0) & is_first)
        seg = _prefix_sum_i32(flags.astype(jnp.int32))     # 0..CHUNK
        nloc = _onehot_extract(seg, CHUNK - 1)             # flags in chunk

        # -- open-run (segment 0) partials fold into the carry ------------
        m0 = seg == 0
        cnt0 = _sum_i32(m0.astype(jnp.int32))
        s0_lo = _sum_i32(jnp.where(m0, v & 0xFFF, np.int32(0)))
        s0_md = _sum_i32(jnp.where(m0, (v >> 12) & 0xFFF, np.int32(0)))
        s0_hi = _sum_i32(jnp.where(m0, v >> 24, np.int32(0)))
        ocnt = ocnt + cnt0
        ahi, alo = _split64(s0_md, 12)
        bhi, blo = _split64(s0_hi, 24)
        oshi, oslo = _add64(oshi, oslo, 0, s0_lo)
        oshi, oslo = _add64(oshi, oslo, ahi, alo)
        oshi, oslo = _add64(oshi, oslo, bhi, blo)
        omax = _onehot_extract(v, CHUNK - 1)               # ascending in-group

        # -- per-segment partials on the MXU ------------------------------
        # (bool->f32 via where: Mosaic has no direct bool->float convert)
        # M_T[s, j] = row j belongs to segment s+1
        m_t = jnp.where(seg_cols == seg[None, :],
                        jnp.float32(1.0), jnp.float32(0.0))
        # GS_T[s, j] = row j STARTS segment s+1 (one-hot row)
        gs_t = m_t * jnp.where(flags[None, :],
                               jnp.float32(1.0), jnp.float32(0.0))

        p_sum = jnp.stack([
            (v & 0xFFF).astype(jnp.float32),
            ((v >> 12) & 0xFFF).astype(jnp.float32),
            (v >> 24).astype(jnp.float32),
            jnp.ones((CHUNK,), jnp.float32),
        ], axis=1)
        r_sum = jnp.dot(m_t, p_sum, preferred_element_type=jnp.float32)

        p_gth = jnp.stack([
            (k & 0xFFFF).astype(jnp.float32),
            ((k >> 16) & 0xFFFF).astype(jnp.float32),
            (v & 0xFFFF).astype(jnp.float32),
            ((v >> 16) & 0xFFFF).astype(jnp.float32),
            (vp & 0xFFFF).astype(jnp.float32),
            ((vp >> 16) & 0xFFFF).astype(jnp.float32),
        ], axis=1)
        r_gth = jnp.dot(gs_t, p_gth, preferred_element_type=jnp.float32)

        def merge16(lo_f, hi_f):
            return lo_f.astype(jnp.int32) | (hi_f.astype(jnp.int32) << 16)

        seg_cnt = r_sum[:, 3].astype(jnp.int32)
        seg_shi, seg_slo = _add64(
            *_split64(r_sum[:, 1].astype(jnp.int32), 12),
            *_split64(r_sum[:, 2].astype(jnp.int32), 24))
        seg_shi, seg_slo = _add64(seg_shi, seg_slo,
                                  0, r_sum[:, 0].astype(jnp.int32))
        seg_key = merge16(r_gth[:, 0], r_gth[:, 1])
        seg_min = merge16(r_gth[:, 2], r_gth[:, 3])
        # max of segment s = value on the row BEFORE segment s+1 starts;
        # index s of r_gth(prev lanes) is exactly that for the slot layout
        seg_maxprev = merge16(r_gth[:, 4], r_gth[:, 5])

        # -- window vectors: slot 0 = finalized open group, slot s>=1 =
        #    segment s (slots > nloc are garbage, overwritten later) -------
        @pl.when(nloc > 0)
        def _():
            one = np.int32(1)
            w_cnt = lead0(ocnt, _roll1d(seg_cnt, one))
            w_shi = lead0(oshi, _roll1d(seg_shi, one))
            w_slo = lead0(oslo, _roll1d(seg_slo, one))
            w_key = lead0(okey, _roll1d(seg_key, one))
            w_min = lead0(omin, _roll1d(seg_min, one))
            # max lane is NOT rolled: seg_maxprev[s] is already segment s's
            # max (prev-row value where segment s+1 starts), unlike the other
            # lanes where index s holds segment s+1; slot 0 (the finalized
            # open run = segment 0) is seg_maxprev[0] itself
            w_max = seg_maxprev
            _store_window(st_key, olocal, w_key)
            _store_window(st_cnt, olocal, w_cnt)
            _store_window(st_shi, olocal, w_shi)
            _store_window(st_slo, olocal, w_slo)
            _store_window(st_mn, olocal, w_min)
            _store_window(st_mx, olocal, w_max)

        # -- new open group = last segment of the chunk --------------------
        sel = nloc - 1
        ocnt = jnp.where(nloc > 0, _onehot_extract(seg_cnt, sel), ocnt)
        oshi = jnp.where(nloc > 0, _onehot_extract(seg_shi, sel), oshi)
        oslo = jnp.where(nloc > 0, _onehot_extract(seg_slo, sel), oslo)
        okey = jnp.where(nloc > 0, _onehot_extract(seg_key, sel), okey)
        omin = jnp.where(nloc > 0, _onehot_extract(seg_min, sel), omin)
        return (ocnt, oshi, oslo, omin, omax, okey, olocal + nloc)

    def chunk(state):
        """One 2*CHUNK aligned slab: Mosaic dynamic vector loads must sit at
        1024-aligned offsets, so rows are read in aligned pairs of chunks and
        the previous-row lane comes from a 1-rotate + carried scalar."""
        c2, carry, pkey, pval = state
        base = pl.multiple_of(c2 * np.int32(2 * CHUNK), 2 * CHUNK)
        k2 = keys_ref[pl.ds(base, 2 * CHUNK)]
        v2 = vals_ref[pl.ds(base, 2 * CHUNK)]
        for half in (0, 1):
            k = jax.lax.slice_in_dim(k2, half * CHUNK, (half + 1) * CHUNK)
            v = jax.lax.slice_in_dim(v2, half * CHUNK, (half + 1) * CHUNK)
            kp = lead0(pkey, _roll1d(k, np.int32(1)))
            vp = lead0(pval, _roll1d(v, np.int32(1)))
            # first global row forces a new-group flag; carries land in the
            # dummy lead slot (gid -1 -> out[0]), sliced off outside
            is_first = ((i == 0) & (c2 == 0)) if half == 0 else None
            carry = half_chunk(k, v, kp, vp, is_first, carry)
            pkey = _onehot_extract(k, CHUNK - 1)
            pval = _onehot_extract(v, CHUNK - 1)
        return c2 + np.int32(1), carry, pkey, pval

    carry0 = (smem[1], smem[2], smem[3], smem[4], smem[5], smem[6],
              jnp.int32(0))
    # while_loop with an explicit int32 counter: under x64 a fori_loop's
    # internal induction variable is int64, which Mosaic cannot lower
    _, (ocnt, oshi, oslo, omin, omax, okey, olocal), pkey, pval = \
        jax.lax.while_loop(
            lambda st: st[0] < np.int32(CPS // 2), chunk,
            (jnp.int32(0), carry0, smem[7], smem[8]))

    smem[1] = ocnt
    smem[2] = oshi
    smem[3] = oslo
    smem[4] = omin
    smem[5] = omax
    smem[6] = okey
    # last row of this superblock seeds the next step's previous-row lane
    smem[7] = pkey
    smem[8] = pval

    @pl.when(i == last)
    def _():
        # final open group (always exists: padding sentinel group at least);
        # slots past it inside the window are garbage beyond the count
        zero = jnp.zeros((CHUNK,), jnp.int32)
        _store_window(st_key, olocal, lead0(okey, zero))
        _store_window(st_cnt, olocal, lead0(ocnt, zero))
        _store_window(st_shi, olocal, lead0(oshi, zero))
        _store_window(st_slo, olocal, lead0(oslo, zero))
        _store_window(st_mn, olocal, lead0(omin, zero))
        _store_window(st_mx, olocal, lead0(omax, zero))

    n_region = jnp.where(i == last, olocal + 1, olocal)
    counts_out[i] = n_region

    @pl.when(n_region > 0)
    def _():
        base = pl.multiple_of(i * np.int32(SBW), 1024)  # SBW = 33 x 1024
        pairs = ((st_key, key_out), (st_cnt, cnt_out), (st_shi, shi_out),
                 (st_slo, slo_out), (st_mn, mn_out), (st_mx, mx_out))
        # index semaphores with int32 scalars: plain Python ints are
        # weak-i64 under x64 and tpu.memref_slice demands i32 operands
        for lane, (st, out) in enumerate(pairs):
            pltpu.make_async_copy(
                st.at[pl.ds(0, SBW)],
                out.at[pl.ds(base, SBW)],
                sems.at[jnp.int32(lane)],
            ).start()
        for lane, (st, out) in enumerate(pairs):
            pltpu.make_async_copy(
                st.at[pl.ds(0, SBW)],
                out.at[pl.ds(base, SBW)],
                sems.at[jnp.int32(lane)],
            ).wait()


@functools.partial(jax.jit, static_argnums=(2, 3))
def seg_agg_sorted_i32(keys_sorted: jnp.ndarray, vals_sorted: jnp.ndarray,
                       max_groups: int, interpret: bool = False):
    """Dense group outputs from co-sorted (key, value) int32 lanes.

    ``keys_sorted`` must already be sorted ascending with padding rows masked
    to INT32_MAX (they form one trailing sentinel group); ``vals_sorted`` must
    be the matching second sort lane (ride-the-sort: ascending within group).

    Returns (key, cnt_i32, sum_i64, min_i32, max_i32, n_groups_i32) where the
    dense arrays have exactly ``max_groups`` entries; entries >= n_groups are
    garbage.  n_groups INCLUDES the sentinel group when padding was present.
    Overflow (n_groups > max_groups): trailing groups are dropped but
    n_groups is still exact, so the caller's overflow/regrow protocol works
    unchanged.
    """
    n = keys_sorted.shape[0]
    assert n % SB == 0, n
    grid = n // SB
    cap = grid * SBW

    # full-array blocks + explicit int32-zero index maps: the auto-generated
    # index map of an UNBLOCKED spec returns a weak-i64 constant under x64,
    # which the Mosaic pass pipeline refuses (func.return i64).  Outputs are
    # pinned to HBM (pl.ANY with a full block lands in VMEM, whose dynamic
    # slices must be tile-aligned).
    full = pl.BlockSpec((cap,), lambda i: (np.int32(0),),
                        memory_space=pltpu.MemorySpace.HBM)
    kernel = pl.pallas_call(
        _seg_agg_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((SB,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((SB,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            full, full, full, full, full, full,
            pl.BlockSpec((grid,), lambda i: (np.int32(0),),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap,), jnp.int32),  # key at run start
            jax.ShapeDtypeStruct((cap,), jnp.int32),  # count
            jax.ShapeDtypeStruct((cap,), jnp.int32),  # sum hi32
            jax.ShapeDtypeStruct((cap,), jnp.int32),  # sum lo32
            jax.ShapeDtypeStruct((cap,), jnp.int32),  # min
            jax.ShapeDtypeStruct((cap,), jnp.int32),  # max
            jax.ShapeDtypeStruct((grid,), jnp.int32),  # entries per region
        ],
        scratch_shapes=[
            # per-lane 1D output staging; +_W so RMW window stores at
            # offset <= SB fit (2D lane slicing breaks DMA sublane tiling)
            pltpu.VMEM((SB + _W,), jnp.int32),
            pltpu.VMEM((SB + _W,), jnp.int32),
            pltpu.VMEM((SB + _W,), jnp.int32),
            pltpu.VMEM((SB + _W,), jnp.int32),
            pltpu.VMEM((SB + _W,), jnp.int32),
            pltpu.VMEM((SB + _W,), jnp.int32),
            pltpu.SMEM((10,), jnp.int32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
    )
    key_r, cnt_r, shi_r, slo_r, mn_r, mx_r, counts = kernel(
        keys_sorted, vals_sorted)

    # compact the per-superblock regions with one gather: global entry e
    # lives in region r at local slot e - starts[r].  Entry 0 is the dummy
    # lead slot (gid -1, forced by the first-row flag) and is skipped.
    starts = (jnp.cumsum(counts.astype(jnp.int32)) - counts).astype(jnp.int32)
    ng = starts[-1] + counts[-1] - 1  # total entries minus the dummy lead
    e = jnp.arange(1, max_groups + 1, dtype=jnp.int32)
    r = (jnp.searchsorted(starts, e, side="right", method="scan")
         .astype(jnp.int32) - 1)
    src = jnp.clip(r * np.int32(SBW) + (e - starts[r]), 0, cap - 1)
    key_g, cnt_g = key_r[src], cnt_r[src]
    sum64 = (shi_r[src].astype(jnp.int64) << 32) | (
        slo_r[src].astype(jnp.int64) & 0xFFFFFFFF)
    return key_g, cnt_g, sum64, mn_r[src], mx_r[src], ng
