"""Does XLA's stable sort cost an extra operand on TPU?

Stability on a bitonic-network sort requires an internal tie-break iota
riding every merge pass; if so, ``is_stable=False`` cuts the groupby/join
sort floor by ~1 operand's worth of HBM traffic.  Also measures explicit
operand-count scaling (1/2/3 operands) to calibrate.

Run on TPU:  python scripts/probe_sort_stability.py [n]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from gpu_olap_tpu.utils.jaxenv import ensure_jax  # noqa: E402

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
G = 4_000_000
print(f"device={jax.devices()[0]} N={N}", flush=True)

rng = np.random.default_rng(1)
k32 = jax.device_put(rng.integers(0, G, N).astype(np.int32))
v32 = jax.device_put(rng.integers(0, 1 << 20, N).astype(np.int32))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:22s} {best*1e3:8.1f} ms ({N/best/1e6:7.1f}M rows/s)",
          flush=True)
    return best


timeit("sort1_stable", lambda a: jax.lax.sort((a,), num_keys=1), k32)
timeit("sort1_unstable",
       lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False), k32)
timeit("sort2_stable",
       lambda a, b: jax.lax.sort((a, b), num_keys=2), k32, v32)
timeit("sort2_unstable",
       lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False),
       k32, v32)
timeit("sort2_keys1_unstable",
       lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False),
       k32, v32)
timeit("sort3_unstable",
       lambda a, b: jax.lax.sort(
           (a, b, jnp.arange(N, dtype=jnp.int32)), num_keys=3,
           is_stable=False), k32, v32)

# equivalence check at a smaller shape: unstable num_keys=2 must produce the
# same (k, v) multiset in the same sorted order as stable
n = 1 << 20
a, b = k32[:n], v32[:n]
s1 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))(a, b)
s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                       is_stable=False))(a, b)
ok = bool(jnp.array_equal(s1[0], s2[0]) & jnp.array_equal(s1[1], s2[1]))
print(f"unstable(k,v) == stable(k,v): {ok}", flush=True)
