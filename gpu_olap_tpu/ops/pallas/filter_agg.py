"""Pallas TPU kernel: fused filter + partial aggregation.

The reference JITs a per-predicate CUDA filter kernel that writes a bitmask
(``codegen.rs:36-47``) followed by separate aggregation kernels.  This Pallas
kernel fuses the whole ``WHERE v > c -> COUNT/SUM`` pipeline into one pass
over HBM: the grid walks row blocks, Pallas double-buffers the HBM->VMEM
block loads automatically, and the VPU computes the mask and per-block
partial sums in registers.  One final (tiny) reduction over per-block
partials happens in XLA.

Single pass, 8 bytes read per row, no intermediate mask materialization:
this is the speed-of-light shape for BASELINE config 1.
"""

from __future__ import annotations

from ...utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

# rows per grid step; (BLOCK // 128) x 128 vector tiles of int32
_BLOCK = 64 * 1024


def _kernel(thresh_ref, v_ref, nvalid_ref, count_ref, sum_ref):
    """One row block: mask = v > thresh (and row in valid prefix);
    emit partial count and sum for this block."""
    i = pl.program_id(0)
    base = i * _BLOCK
    v = v_ref[:]
    # rows beyond the table's true length are padding
    idx = base + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    in_prefix = idx < nvalid_ref[0]
    mask = (v > thresh_ref[0]) & in_prefix
    count_ref[0] = jnp.sum(mask.astype(jnp.int32))
    sum_ref[0] = jnp.sum(jnp.where(mask, v, 0).astype(jnp.float32))


def filter_count_sum_i32(values: jnp.ndarray, threshold, n_valid) -> tuple:
    """Fused ``COUNT(*), SUM(v) WHERE v > threshold`` over an int32 column.

    Returns (count i64, sum i64).  The int32 fast path mirrors the engine's
    zone-map narrowing; partial sums stay exact because each block holds
    <= 64K values of |v| < 2^31 (< 2^47 per block, summed in f32? no —
    see below: per-block sums accumulate in f32 only when exactness is not
    required; the engine calls the exact variant)."""
    n = values.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    if n_pad != n:
        values = jnp.concatenate([
            values, jnp.zeros(n_pad - n, dtype=values.dtype)])
    grid = n_pad // _BLOCK

    counts, sums = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid,), jnp.int32),
            jax.ShapeDtypeStruct((grid,), jnp.float32),
        ],
    )(jnp.asarray([threshold], dtype=values.dtype), values,
      jnp.asarray([n_valid], dtype=jnp.int32))
    return (jnp.sum(counts.astype(jnp.int64)),
            jnp.sum(sums.astype(jnp.float64)))


def _kernel_exact(thresh_ref, v_ref, nvalid_ref, count_ref, shi_ref, slo_ref):
    """Exact-integer variant: per-block sum split into (high, low) 32-bit
    partials so the total reconstructs an exact int64 without 64-bit VPU ops."""
    i = pl.program_id(0)
    base = i * _BLOCK
    v = v_ref[:]
    idx = base + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    in_prefix = idx < nvalid_ref[0]
    mask = (v > thresh_ref[0]) & in_prefix
    masked = jnp.where(mask, v, 0)
    # split each value into 16-bit halves; block sums of halves fit int32
    lo = masked & 0xFFFF
    hi = masked >> 16
    count_ref[0] = jnp.sum(mask.astype(jnp.int32))
    slo_ref[0] = jnp.sum(lo.astype(jnp.int32))
    shi_ref[0] = jnp.sum(hi.astype(jnp.int32))


def filter_count_sum_exact_i32(values: jnp.ndarray, threshold, n_valid):
    """Exact int64 ``COUNT/SUM WHERE v > c`` for non-negative int32 values."""
    n = values.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    if n_pad != n:
        values = jnp.concatenate([
            values, jnp.zeros(n_pad - n, dtype=values.dtype)])
    grid = n_pad // _BLOCK

    counts, hi, lo = pl.pallas_call(
        _kernel_exact,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid,), jnp.int32),
            jax.ShapeDtypeStruct((grid,), jnp.int32),
            jax.ShapeDtypeStruct((grid,), jnp.int32),
        ],
    )(jnp.asarray([threshold], dtype=values.dtype), values,
      jnp.asarray([n_valid], dtype=jnp.int32))
    total = (jnp.sum(hi.astype(jnp.int64)) << 16) + jnp.sum(lo.astype(jnp.int64))
    return jnp.sum(counts.astype(jnp.int64)), total
