"""Pallas TPU kernel: radix histogram (partition pass 1).

The reference's ``radix_partition_kernel`` histogram phase uses atomicAdd on
partition counters (``join_kernels.cuh:45-76``).  The TPU version computes
per-block 256-bin histograms with a one-hot compare matrix reduced on the VPU
— no atomics, no scatter — and the engine combines block histograms with a
(cheap) XLA sum + exclusive prefix for partition offsets.

Used for shuffle capacity planning / skew detection on large key columns.
"""

from __future__ import annotations

from ...utils.jaxenv import ensure_jax

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_BLOCK = 16 * 1024
_BINS = 256


def _hist_kernel(shift_ref, keys_ref, hist_ref):
    keys = keys_ref[:]
    digit = (keys >> shift_ref[0]) & (_BINS - 1)
    # one-hot (rows x 256) compare, summed down rows on the VPU
    bins = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _BINS), 1)
    onehot = (digit[:, None] == bins).astype(jnp.int32)
    hist_ref[:] = jnp.sum(onehot, axis=0, keepdims=True)


def radix_histogram_i32(keys: jnp.ndarray, shift: int = 0,
                        interpret: bool = False) -> jnp.ndarray:
    """256-bin histogram of ``(key >> shift) & 0xFF`` over an int32 array.

    Returns int64 counts (256,).  Keys must be non-negative in the shifted
    byte (mask handles the rest)."""
    n = keys.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    if n_pad != n:
        # pad with a value whose digit is 0; subtract the padding afterwards
        keys = jnp.concatenate([keys, jnp.zeros(n_pad - n, dtype=keys.dtype)])
    grid = n_pad // _BLOCK

    hists = pl.pallas_call(
        _hist_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BINS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, _BINS), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([shift], dtype=jnp.int32), keys)
    total = jnp.sum(hists.astype(jnp.int64), axis=0)
    pad_count = n_pad - n
    total = total.at[0].add(-pad_count)
    return total


def partition_offsets(hist: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum over bins — the partition offset table
    (prefix-sum step of ``sort_kernel.rs:41-47``)."""
    return jnp.cumsum(hist) - hist
