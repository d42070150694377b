"""TPU bandwidth ladder: what fraction of the 820 GB/s HBM roofline can
each access pattern actually reach through this stack?

  copy      — jnp.copy of a 1 GB int32 array (XLA's own streaming ceiling)
  reduce    — jnp.sum of the same array (read-only streaming)
  pallas256K/1M/4M — a trivial Pallas reduce kernel at three block sizes
                     (auto-pipelined in_specs), isolating block-size DMA
                     effects from kernel work

VERDICT r2 #5: filter_agg measured 169 GB/s = 20.7% of roofline; this
ladder shows where the ceiling actually is on this chip+relay.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 268_435_456  # 1 GiB int32
x = jax.block_until_ready(jax.jit(
    lambda: jax.random.randint(jax.random.PRNGKey(0), (N,), 0, 1000,
                               dtype=jnp.int32))())
nbytes = N * 4
print(f"device={jax.devices()[0]} n={N} ({nbytes/2**30:.2f} GiB)", flush=True)


def timeit(name, fn, *args, rw_bytes=nbytes):
    f = jax.jit(fn)
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        r = f(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[-1:])
        best = min(best, time.perf_counter() - t0)
    gbps = rw_bytes / best / 1e9
    print(f"{name:14s} {best*1e3:8.1f} ms  {gbps:7.1f} GB/s "
          f"({gbps/820*100:5.1f}% of roofline)", flush=True)


timeit("copy(r+w)", lambda a: a + 1, x, rw_bytes=2 * nbytes)
timeit("reduce", lambda a: jnp.sum(a, dtype=jnp.int32), x)


def make_pallas_reduce(block):
    rows = block // 128

    def kern(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == np.int32(0))
        def _():
            o_ref[...] = jnp.zeros((1, 128), jnp.int32)

        o_ref[...] = o_ref[...] + jnp.sum(x_ref[...], axis=0, keepdims=True,
                                          dtype=jnp.int32)

    def f(a):
        n_pad = -(-a.shape[0] // block) * block
        if n_pad != a.shape[0]:
            a = jnp.concatenate([a, jnp.zeros(n_pad - a.shape[0], jnp.int32)])
        grid = n_pad // block
        out = pl.pallas_call(
            kern, grid=(grid,),
            in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, np.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128),
                                   lambda i: (np.int32(0), np.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        )(a.reshape(n_pad // 128, 128))
        return jnp.sum(out, dtype=jnp.int32)

    return f


for blk, name in [(16 * 2048, "pallas32K"), (256 * 1024, "pallas256K"),
                  (1 << 20, "pallas1M"), (1 << 22, "pallas4M")]:
    timeit(name, make_pallas_reduce(blk), x)


# ---- device -> host pull (the bench result-download cost) ---------------
def pull(name, arr):
    np.asarray(arr)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        h = np.asarray(arr)
        best = min(best, time.perf_counter() - t0)
    mb = arr.size * arr.dtype.itemsize / 2**20
    print(f"{name:14s} {best*1e3:8.1f} ms  {mb/best/1024:7.3f} GB/s "
          f"({mb:.0f} MB)", flush=True)


one = jax.block_until_ready(x[: 1 << 24])          # 64 MB single array
pull("pull 64MB x1", one)
four = [jax.block_until_ready(x[i * (1 << 22):(i + 1) * (1 << 22)])
        for i in range(4)]                          # 4 x 16 MB
t0 = time.perf_counter()
for a in four:
    np.asarray(a)
dt = time.perf_counter() - t0
print(f"{'pull 16MB x4':14s} {dt*1e3:8.1f} ms  {64/1024/dt:7.3f} GB/s",
      flush=True)
small = [jax.block_until_ready(x[i * 1024:(i + 1) * 1024])
         for i in range(64)]                        # 64 x 4 KB
t0 = time.perf_counter()
for a in small:
    np.asarray(a)
dt = time.perf_counter() - t0
print(f"{'pull 4KB x64':14s} {dt*1e3:8.1f} ms  ({dt/64*1e3:.1f} ms each)",
      flush=True)
