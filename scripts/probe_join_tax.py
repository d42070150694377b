"""Account for the honest-join engine time (bench config 3 shape).

Engine exec at 100M x 100M non-unique keys measured 1.667 s (r4 campaign).
This probe times the stage floors as separate jitted programs:

  cosort2   tagged co-sort, 2 int32 lanes at 200M+pad rows (unstable)
  cosort3   + one payload lane (what payload-carrying queries pay)
  engine    the full engine query (exec_seconds), for the delta

Run on TPU:  python scripts/probe_join_tax.py [n_per_side]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from gpu_olap_tpu.utils.jaxenv import ensure_jax  # noqa: E402

jax = ensure_jax()
import jax.numpy as jnp  # noqa: E402

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
NK = N // 2
print(f"device={jax.devices()[0]} N={N} per side, keys={NK}", flush=True)

rng = np.random.default_rng(2)
lk_h = rng.integers(0, NK, N).astype(np.int64)
rk_h = rng.integers(0, NK, N).astype(np.int64)


def timeit(name, fn, *args, rows=2 * N):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} {best*1e3:8.1f} ms ({rows/best/1e6:7.1f}M rows/s l+r)",
          flush=True)
    return best


lk32 = jax.device_put(lk_h.astype(np.int32))
rk32 = jax.device_put(rk_h.astype(np.int32))
n2 = 2 * N
pad = (-n2) % 2048
i32max = np.int32(np.iinfo(np.int32).max)


def cosort(nlanes):
    def fn(a, b):
        key = jnp.concatenate([a, b]) * np.int32(2)
        key = key + jnp.concatenate([jnp.zeros(N, jnp.int32),
                                     jnp.ones(N, jnp.int32)])
        rowid = jnp.concatenate([jnp.arange(N, dtype=jnp.int32)] * 2)
        lanes = [key, rowid] + [rowid] * (nlanes - 2)
        if pad:
            pads = [jnp.full(pad, i32max, jnp.int32)] + [
                jnp.zeros(pad, jnp.int32)] * (nlanes - 1)
            lanes = [jnp.concatenate([x, p]) for x, p in zip(lanes, pads)]
        return jax.lax.sort(tuple(lanes), num_keys=2, is_stable=False)
    return fn


timeit("cosort2", cosort(2), lk32, rk32)
timeit("cosort3", cosort(3), lk32, rk32)

# ---- full engine --------------------------------------------------------
from gpu_olap_tpu import EngineConfig, OlapEngine  # noqa: E402
from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS  # noqa: E402

cfg = EngineConfig(backend="device", join_expansion=2.2,
                   max_groups=1 << 23, min_shape_bucket=1 << 16,
                   enable_cache=False)
eng = OlapEngine(cfg)
eng.register("l", {"k": lk_h})
eng.register("r", {"k": rk_h})
sql = "SELECT COUNT(*) AS n, SUM(l.k + r.k) AS s FROM l JOIN r ON l.k = r.k"
eng.query(sql)
best = float("inf")
for _ in range(3):
    s0 = GLOBAL_METRICS.ops.get("device_execute").seconds
    eng.query(sql)
    best = min(best, GLOBAL_METRICS.ops.get("device_execute").seconds - s0)
print(f"engine exec {best*1e3:8.1f} ms ({2*N/best/1e6:7.1f}M rows/s l+r)",
      flush=True)
