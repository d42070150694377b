"""First-hardware validation of the sorted-space join kernels.

Runs stream_compact_i32, expand_fill_i32, and the full inner_join_stream
on the real device at escalating sizes with numpy parity checks.

Usage: python scripts/micro_join_stream_tpu.py [n_per_side]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from gpu_olap_tpu.ops import join as J  # noqa: E402
from gpu_olap_tpu.ops.pallas import join_stream as js  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
rng = np.random.default_rng(3)
print(f"device={jax.devices()[0]} n={N}", flush=True)

# ---- stream_compact ------------------------------------------------------
n = -(-N // js.SB) * js.SB
mask = (rng.random(n) < 0.31)
a = rng.integers(-(1 << 31), 1 << 31, n).astype(np.int32)
cap = int(mask.sum()) + 64
f = jax.jit(lambda m, x: js.stream_compact_i32(m, [x], cap, False))
md = jax.device_put(jnp.asarray(mask))
ad = jax.device_put(jnp.asarray(a))
t0 = time.perf_counter()
(out,), cnt = f(md, ad)
cnt = int(cnt)
print(f"compact compile+run {time.perf_counter()-t0:.1f}s", flush=True)
ok = cnt == mask.sum() and np.array_equal(np.asarray(out)[:cnt], a[mask])
print("stream_compact parity:", ok, flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    (o2,), c2 = f(md, ad)
    np.asarray(o2.ravel()[-1:])
    best = min(best, time.perf_counter() - t0)
print(f"stream_compact {best*1e3:.1f} ms ({n/best/1e6:.0f}M elem/s)", flush=True)

# ---- expand_fill ---------------------------------------------------------
m = 200_000
cnts = rng.integers(1, 6, m).astype(np.int64)
starts = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int32)
total = int(cnts.sum())
va = rng.integers(-(1 << 31), 1 << 31, m).astype(np.int32)
capx = -(-total // js.SB) * js.SB
pad_len = -(-(m + 2304) // js.SB) * js.SB
sp = np.concatenate([starts,
                     np.full(pad_len - m, np.iinfo(np.int32).max, np.int32)])
fx = jax.jit(lambda s, x: js.expand_fill_i32(s, [x], capx, False))
spd = jax.device_put(jnp.asarray(sp))
vad = jax.device_put(jnp.asarray(np.resize(va, pad_len)))
t0 = time.perf_counter()
off, fa = fx(spd, vad)
off = np.asarray(off)[:total]
fa = np.asarray(fa)[:total]
print(f"expand compile+run {time.perf_counter()-t0:.1f}s", flush=True)
exp_rec = np.repeat(np.arange(m), cnts)
ok = (np.array_equal(off, np.arange(total) - starts.astype(np.int64)[exp_rec])
      and np.array_equal(fa, va[exp_rec]))
print("expand_fill parity:", ok, flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    r = fx(spd, vad)
    np.asarray(r[0].ravel()[-1:])
    best = min(best, time.perf_counter() - t0)
print(f"expand_fill {best*1e3:.1f} ms ({capx/best/1e6:.0f}M slots/s)", flush=True)

# ---- full inner_join_stream ---------------------------------------------
nkeys = max(N // 2, 1)
lk = rng.integers(0, nkeys, N).astype(np.int32)
rk = rng.integers(0, nkeys, N).astype(np.int32)
capj = -(-int(2 * N * 2.2) // js.SB) * js.SB
fj = jax.jit(lambda a, b: J.inner_join_stream(
    a, jnp.zeros(N, bool), b, jnp.zeros(N, bool), capj, (0, nkeys - 1),
    emit_key=True, need_ri=False, interpret=False))
lkd = jax.device_put(jnp.asarray(lk))
rkd = jax.device_put(jnp.asarray(rk))
t0 = time.perf_counter()
res = fj(lkd, rkd)
total = int(res["total"])
print(f"join compile+run {time.perf_counter()-t0:.1f}s total={total}",
      flush=True)
# spot parity on counts + sampled key fill
import collections
cnt_by_key = collections.Counter(rk.tolist())
exp_total = sum(cnt_by_key.get(k, 0) for k in lk.tolist())
li = np.asarray(res["li"])
kf = np.asarray(res["key"])
ov = np.asarray(res["out_valid"])
pick = np.linspace(0, total - 1, 2048).astype(np.int64)
ok = (total == exp_total and bool(ov[:total].all())
      and np.array_equal(kf[pick], lk[li[pick]]))
print(f"join parity: {ok} (total {total} vs {exp_total})", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    r = fj(lkd, rkd)
    np.asarray(r["li"].ravel()[-1:])
    best = min(best, time.perf_counter() - t0)
print(f"inner_join_stream {best*1e3:.1f} ms "
      f"({2*N/best/1e6:.0f}M rows/s l+r)", flush=True)
