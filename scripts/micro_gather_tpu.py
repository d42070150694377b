"""TPU gather-cost probe: does index locality matter?

The 25Mx25M join measured ~90M gathered elements/s (2.5 s for the CAP-sized
expand gathers), which makes random gathers the join's dominant cost.  This
probe times jnp.take at a fixed output size with different index patterns:

  random      — uniform over the table
  sorted      — same multiset, sorted ascending (monotone)
  unit        — run-length-decoded iota (monotone, unit steps, repeats)
  iota        — the identity (pure streaming read, lower bound)

and two table sizes (cache residency).  If monotone/unit are much faster
than random, the join should emit pairs in merge-sorted order; if gather cost
is flat (issue-bound), expansion must move into a Pallas kernel with
sequential DMA instead.

Usage: python scripts/micro_gather_tpu.py [out_size] [table_size]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
TAB = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000

rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]} out={OUT} table={TAB}", flush=True)
table = jax.device_put(jnp.asarray(
    rng.integers(0, 1 << 20, TAB).astype(np.int32)))


def timeit(name, idx_np):
    idx = jax.device_put(jnp.asarray(idx_np))

    @jax.jit
    def f(t, ix):
        return jnp.sum(t[ix], dtype=jnp.int32)

    r = f(table, idx)
    np.asarray(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(table, idx))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} {best*1e3:9.1f} ms  ({OUT/best/1e6:8.1f}M elem/s)",
          flush=True)
    return best


rnd = rng.integers(0, TAB, OUT).astype(np.int32)
timeit("random", rnd)
timeit("sorted", np.sort(rnd))
# unit: each table pos repeated ~OUT/TAB times (run-length decode pattern)
reps = OUT // TAB
unit = np.repeat(np.arange(TAB, dtype=np.int32), reps)[:OUT]
timeit("unit", unit)
timeit("iota", (np.arange(OUT) % TAB).astype(np.int32))
# near-monotone with small rewinds (the sorted-space join's build pattern)
near = np.minimum(unit + rng.integers(0, 4, OUT).astype(np.int32), TAB - 1)
timeit("near", near)
