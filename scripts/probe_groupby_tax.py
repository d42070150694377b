"""Account for the groupby engine tax (VERDICT r4 task #2).

At the bench shape (100M rows / 4M groups, int64 cols narrowed to int32
shadows) measure, each as ONE jitted program on the real device:

  sort2        lax.sort((k32, v32), num_keys=2)           — the floor
  sort1        lax.sort((k32,), num_keys=1)               — operand scaling
  sortseg      sort2 + seg_agg kernel + output assembly   — kernel pipeline
  engine       full OlapEngine query (exec_seconds)       — the engine level

plus a lax.sort scaling curve (12.5/25/50/100M) to see the pass-count
exponent for a chunked-sort design.

Run on TPU:  python scripts/probe_groupby_tax.py [n_rows]
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
print(f"device={jax.devices()[0]} N={N} G={G}", flush=True)


def timeit(name, fn, *args, iters=3):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])  # sync via relay
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best*1e3:8.1f} ms ({N/best/1e6:7.1f}M rows/s)",
          flush=True)
    return best


rng = np.random.default_rng(1)
k_host = rng.integers(0, G, N).astype(np.int32)
v_host = rng.integers(0, 1_000_000, N).astype(np.int32)
k32 = jax.device_put(k_host)
v32 = jax.device_put(v_host)

# ---- sort scaling curve --------------------------------------------------
for frac in (8, 4, 2):
    n = N // frac
    a, b = k32[:n], v32[:n]
    f = jax.jit(lambda x, y: jax.lax.sort((x, y), num_keys=2))
    r = f(a, b)
    np.asarray(r[0][-1:])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(a, b)
        np.asarray(r[0][-1:])
        best = min(best, time.perf_counter() - t0)
    print(f"sort2@{n/1e6:5.1f}M {best*1e3:8.1f} ms ({n/best/1e6:7.1f}M rows/s)",
          flush=True)

timeit("sort1", lambda a: jax.lax.sort((a,), num_keys=1), k32)
t_sort2 = timeit("sort2", lambda a, b: jax.lax.sort((a, b), num_keys=2),
                 k32, v32)

# batched chunked sort: (C, N/C) along the minor axis
for C in (8, 32):
    if N % C == 0:
        timeit(f"sort2x{C}", lambda a, b, C=C: jax.lax.sort(
            (a.reshape(C, -1), b.reshape(C, -1)), num_keys=2, dimension=1),
            k32, v32)

# ---- sort + seg_agg + assembly ------------------------------------------
from gpu_olap_tpu.ops.pallas.seg_agg import SB, seg_agg_sorted_i32  # noqa: E402

MAXG = 1 << 23


def sortseg(a, b):
    sk, sv = jax.lax.sort((a, b), num_keys=2)
    pad = (-N) % SB
    if pad:
        sk = jnp.concatenate([sk, jnp.full(pad, np.int32(2**31 - 1), jnp.int32)])
        sv = jnp.concatenate([sv, jnp.zeros(pad, jnp.int32)])
    key_g, cnt_g, sum64, mn_g, mx_g, ng = seg_agg_sorted_i32(
        sk, sv, MAXG, jax.default_backend() != "tpu")
    g = jnp.arange(MAXG, dtype=jnp.int32)
    exists = g < ng
    return (jnp.where(exists, key_g, 0), jnp.where(exists, cnt_g, 0),
            jnp.where(exists, sum64, 0), mn_g, mx_g, ng)


t_pipe = timeit("sortseg", sortseg, k32, v32)

# ---- full engine ---------------------------------------------------------
from gpu_olap_tpu import EngineConfig, OlapEngine  # noqa: E402
from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS  # noqa: E402

cfg = EngineConfig(backend="device", max_groups=1 << 23,
                   min_shape_bucket=1 << 16, enable_cache=False)
cfg.use_pallas_seg_agg = True
eng = OlapEngine(cfg)
eng.register("t", {"k": k_host.astype(np.int64), "v": v_host.astype(np.int64)})
sql = "SELECT k, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx FROM t GROUP BY k"
eng.query(sql)  # warm
best_e2e, best_exec = float("inf"), float("inf")
for _ in range(3):
    st0 = GLOBAL_METRICS.ops.get("device_execute").seconds
    t0 = time.perf_counter()
    r = eng.query(sql)
    e2e = time.perf_counter() - t0
    ex = GLOBAL_METRICS.ops.get("device_execute").seconds - st0
    best_e2e, best_exec = min(best_e2e, e2e), min(best_exec, ex)
print(f"engine exec {best_exec*1e3:8.1f} ms ({N/best_exec/1e6:7.1f}M rows/s) "
      f"e2e {best_e2e*1e3:8.1f} ms ({N/best_e2e/1e6:7.1f}M rows/s) "
      f"groups={r.num_rows} seg={GLOBAL_METRICS.counters.get('pallas_seg_agg_trace', 0)}",
      flush=True)
print(f"tax: engine-exec minus sortseg = {(best_exec-t_pipe)*1e3:.1f} ms",
      flush=True)
