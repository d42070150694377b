"""Measure the TPU cost of ONE bit of a butterfly-based radix split pass
(round 5, VERDICT r4 missing #2/#3: "build the Pallas radix-partition data
path ... replacing the lax.sort front-end").

The proposed design moves (key, value) int32 lanes to stable digit bins with
the bit-serial butterfly router (ops/pallas/routing.py) — the only scatter
substitute this hardware offers.  A radix BINNING pass over b bits costs b
1-bit stable splits; each 1-bit split routes BOTH polarity classes through
log2(block_slots) butterfly stages.  This probe times exactly one
zeros-compaction butterfly (half of one 1-bit split) per block, measured at
the same shape as the engine's groupby sort front-end, so the full radix
replacement can be projected from hardware numbers instead of hand-waving:

    radix(22-bit keys) ~= 22 x 2 x (measured butterfly - block IO) + 3 x IO

Compare against the measured lax.sort (k, v) unstable pair at the same rows
(356 ms at 100M on v5e, DESIGN_NOTES.md round 4).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from gpu_olap_tpu.utils.jaxenv import ensure_jax  # noqa: E402

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from gpu_olap_tpu.ops.pallas.routing import (  # noqa: E402
    LANES, _c, _cumsum_flat, _pos_iota, route_left)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 27  # 134M rows
BLOCK_ROWS = 1024            # sublane rows per grid step: 128K slots
# (2048-row blocks put 19.2 MB on the scoped-VMEM stack, over the 16 MB cap)
SLOTS = BLOCK_ROWS * LANES
STAGES = 17                  # log2(128K) butterfly stages
BIT = 7

interpret = jax.default_backend() != "tpu"
print(f"device={jax.devices()[0]} rows={N} block={SLOTS} stages={STAGES}",
      flush=True)


def make_kernel(do_route: bool, do_cumsum: bool):
    def kern(k_ref, v_ref, ko_ref, vo_ref):
        k = k_ref[...]
        v = v_ref[...]
        if do_cumsum:
            bit = (k >> _c(BIT)) & _c(1)
            zeros = _c(1) - bit
            rank0 = _cumsum_flat(zeros)            # inclusive
            pos = _pos_iota(BLOCK_ROWS)
            # zeros move left to their stable compact slot; ones sit out
            d = jnp.where(bit == _c(0), pos - (rank0 - _c(1)), _c(-1))
            if do_route:
                k, v = route_left(d, [k, v], STAGES)
        ko_ref[...] = k
        vo_ref[...] = v

    grid = (N // SLOTS,)
    # np.int32 literal: a bare 0 traces as weak i64 under x64 and Mosaic
    # fails to legalize the index-map's (i32, i64) return (CLAUDE.md rule)
    spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, np.int32(0)))
    shape = jax.ShapeDtypeStruct((N // LANES, LANES), jnp.int32)

    def run(k, v):
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[spec, spec], out_specs=[spec, spec],
            out_shape=[shape, shape], interpret=interpret,
        )(k, v)

    return jax.jit(run)


rng = np.random.default_rng(0)
k_h = rng.integers(0, 1 << 22, N).astype(np.int32).reshape(N // LANES, LANES)
v_h = rng.integers(0, 1 << 20, N).astype(np.int32).reshape(N // LANES, LANES)
kd, vd = jnp.asarray(k_h), jnp.asarray(v_h)


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[-1:])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[-1:])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:26s} {best*1e3:8.1f} ms", flush=True)
    return best


t_io = timeit("block IO (copy k,v)", make_kernel(False, False), kd, vd)
t_cs = timeit("IO + bit + cumsum", make_kernel(True, False), kd, vd)
t_rt = timeit("IO + cumsum + butterfly", make_kernel(True, True), kd, vd)


def sort_pair(k, v):
    return jax.lax.sort((k.reshape(-1), v.reshape(-1)), num_keys=2,
                        is_stable=False)


t_sort = timeit("lax.sort (k,v) unstable", jax.jit(sort_pair), kd, vd)

butterfly = t_rt - t_cs
one_bit_split = 2 * butterfly + (t_cs - t_io)  # both polarity classes
radix22 = 22 * one_bit_split + 3 * t_io        # 3x 8-bit pass IO
print(f"\nbutterfly(18st,2str):   {butterfly*1e3:8.1f} ms")
print(f"1-bit stable split:     {one_bit_split*1e3:8.1f} ms")
print(f"22-bit radix projection:{radix22*1e3:8.1f} ms "
      f"(vs lax.sort {t_sort*1e3:.1f} ms -> "
      f"{'WINS' if radix22 < t_sort else 'LOSES'} "
      f"{radix22/t_sort:.1f}x)", flush=True)
