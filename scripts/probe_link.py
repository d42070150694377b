"""Host<->device link probe (round 5, VERDICT r4 weak #1 / next #3).

The groupby 100M/4M config loses ~2.2 s of its 2.76 s e2e to host-boundary
cost (result download of ~4M-group columns).  This probe measures what the
link actually does TODAY for each transfer shape/strategy, so the engine fix
(narrowing, chunked async overlap) targets the real bottleneck:

  up-<size>        device_put of one int32 array, blocked
  up-pipelined     8 x 32MB puts issued async, then blocked together
  down-i32-128M    np.asarray of one 128MB int32 device array
  down-i64-128M    same bytes as int64 (does emulated s64 pay extra?)
  down-chunked     16 x 8MB sequential np.asarray slices
  down-async4      4 x 32MB arrays: copy_to_host_async all, then convert
  down-async-cols  4 x 32MB arrays (the groupby result shape: k,s,mn,mx)
                   fetched with per-array async prefetch
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from gpu_olap_tpu.utils.jaxenv import ensure_jax  # noqa: E402

jax = ensure_jax()  # x64 on, matching the engine environment
import jax.numpy as jnp  # noqa: E402

print(f"device={jax.devices()[0]}", flush=True)


def timeit(name, fn, nbytes, iters=3):
    fn()  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s} {best*1e3:9.1f} ms  {nbytes/best/1e6:9.1f} MB/s",
          flush=True)
    return best


MB = 1 << 20

# ---- upload ---------------------------------------------------------------
for mb in (8, 32, 128):
    host = np.random.default_rng(0).integers(0, 1 << 30, mb * MB // 4,
                                             dtype=np.int32)
    timeit(f"up-{mb}M", lambda h=host: jax.block_until_ready(
        jax.device_put(h)), mb * MB)

host_chunks = [np.random.default_rng(i).integers(0, 1 << 30, 32 * MB // 4,
                                                 dtype=np.int32)
               for i in range(8)]


def up_pipelined():
    futs = [jax.device_put(h) for h in host_chunks]
    jax.block_until_ready(futs)


timeit("up-pipelined-8x32M", up_pipelined, 256 * MB)

# ---- download -------------------------------------------------------------
# np.asarray on a jax.Array CACHES the host copy — every download timing must
# convert arrays produced fresh on device this iteration (the counter input
# defeats both the npy cache and the jit-output cache).
G = 4_000_000  # the groupby flagship's output rows (4M groups)


@jax.jit
def make_cols(i):
    """Mimic the groupby result shape: k,s int64 + mn,mx int64 (4M each)."""
    k = jax.lax.iota(jnp.int64, G) + i
    return k, k * 7, k & 0xFFFFF, k | 1


@jax.jit
def make_cols32(i):
    k = jax.lax.iota(jnp.int32, G) + i
    return k, k * 7, k & 0xFFFFF, k | 1


def bench_down(name, maker, nbytes, fetch):
    it = [0]

    def run():
        it[0] += 1
        cols = jax.block_until_ready(maker(it[0]))
        t0 = time.perf_counter()
        fetch(cols)
        return time.perf_counter() - t0

    run()  # warm compile
    best = min(run() for _ in range(3))
    print(f"{name:22s} {best*1e3:9.1f} ms  {nbytes/best/1e6:9.1f} MB/s",
          flush=True)


def fetch_seq(cols):
    for c in cols:
        np.asarray(c)


def fetch_async(cols):
    for c in cols:
        c.copy_to_host_async()
    for c in cols:
        np.asarray(c)


bench_down("down-4xi64-seq", make_cols, 4 * G * 8, fetch_seq)
bench_down("down-4xi64-async", make_cols, 4 * G * 8, fetch_async)
bench_down("down-4xi32-seq", make_cols32, 4 * G * 4, fetch_seq)
bench_down("down-4xi32-async", make_cols32, 4 * G * 4, fetch_async)


def fetch_chunked(cols):
    # 8 slices per column, all async-prefetched (does chunking pipeline?)
    step = G // 8
    parts = [c[i * step:(i + 1) * step] for c in cols for i in range(8)]
    for p in parts:
        p.copy_to_host_async()
    for p in parts:
        np.asarray(p)


bench_down("down-4xi64-chunk8", make_cols, 4 * G * 8, fetch_chunked)
