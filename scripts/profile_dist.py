"""Per-stage profile of the distributed join+group-by step on the virtual
CPU mesh (VERDICT round-1 item 6: find where distributed time goes).

Splits the fused step into separately-jitted stages:
  shuffle   — bucket + all_to_all both sides (communication + packing)
  local     — sort-probe join + grouped aggregation on pre-shuffled shards
  fused     — the production single-program step (overlap opportunity)
  1dev_ref  — the same compute as one unsharded program (no shard_map)

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/profile_dist.py [--rows 2**21] [--strong]
"""

import argparse
import functools
import json
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402
from jax import shard_map  # noqa: E402


def timeit(fn, *args, iters=3):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def build(ndev, n_total, iters):
    from gpu_olap_tpu.ops import aggregate as agg_ops
    from gpu_olap_tpu.ops import join as join_ops
    from gpu_olap_tpu.parallel import mesh as mesh_mod, skew
    from gpu_olap_tpu.parallel.mesh import AXIS
    from gpu_olap_tpu.parallel.shuffle import shuffle_rows_local

    mesh = mesh_mod.make_mesh(ndev, devices=jax.devices("cpu"))
    sharding = mesh_mod.row_sharding(mesh)

    n = n_total
    per_dev = n // ndev
    rng = np.random.default_rng(0)
    n_keys = max(n // 16, 64)
    lk = rng.integers(0, n_keys, n).astype(np.int64)
    rk = rng.integers(0, n_keys, n).astype(np.int64)
    lv = rng.integers(1, 100, n).astype(np.int64)
    rv = rng.integers(1, 100, n).astype(np.int64)

    hist = np.asarray(skew.partition_histogram(jnp.asarray(lk), ndev))
    capacity = int(skew.recommend_capacity(hist, ndev, headroom=1.3))
    join_capacity = per_dev * 20
    max_groups = min(n_keys, 1 << 20)

    def shard(a):
        return jax.device_put(a, sharding)

    valid = np.ones(n, bool)
    args = (shard(lk), shard(valid), shard(lv),
            shard(rk), shard(valid), shard(rv))

    # ---- stage 1: shuffle both sides ------------------------------------
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(P(AXIS),) * 6,
                       out_specs=(P(AXIS),) * 6, check_vma=False)
    def shuffle_only(lkeys, lvalid, lval, rkeys, rvalid, rval):
        slk, (slval,), slv, _ = shuffle_rows_local(lkeys, [lval], lvalid, ndev, capacity)
        srk, (srval,), srv, _ = shuffle_rows_local(rkeys, [rval], rvalid, ndev, capacity)
        return slk, slval, slv, srk, srval, srv

    # ---- stage 2: local join + group-by on shuffled shards --------------
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(P(AXIS),) * 6,
                       out_specs=(P(AXIS), P(AXIS), P(AXIS)), check_vma=False)
    def local_only(slk, slval, slv, srk, srval, srv):
        li, ri, out_valid, total, _of, _cnt = join_ops.inner_join(
            [(slk, jnp.zeros_like(slv))], slv,
            [(srk, jnp.zeros_like(srv))], srv,
            join_capacity,
        )
        safe_l = jnp.clip(li, 0, slk.shape[0] - 1)
        safe_r = jnp.clip(ri, 0, srk.shape[0] - 1)
        jkey = slk[safe_l]
        jval = slval[safe_l] * srval[safe_r]
        specs = [{"func": "sum", "values": jval, "valid": None,
                  "distinct": False, "acc_dtype": jnp.int64}]
        group_codes, results, n_groups, _ = agg_ops.groupby_aggregate(
            [(jkey, jnp.zeros_like(out_valid))], out_valid, specs, max_groups,
            n_rows=jkey.shape[0],
        )
        gvalid = jnp.arange(max_groups) < n_groups
        return group_codes[0][0], results[0][0], gvalid

    # ---- fused production step ------------------------------------------
    from gpu_olap_tpu.parallel import dist_ops

    fused = dist_ops.make_dist_join_groupby(
        mesh, capacity=capacity, join_capacity=join_capacity,
        max_groups=max_groups, agg_funcs=("sum",))

    t_shuf = timeit(shuffle_only, *args, iters=iters)
    mid = jax.block_until_ready(shuffle_only(*args))
    t_local = timeit(local_only, *mid, iters=iters)
    # fail instead of profiling an overflowed (row-dropping) configuration
    if bool(np.asarray(fused(*args)[3])):
        raise RuntimeError(f"shuffle/join overflow at ndev={ndev} "
                           f"(capacity={capacity})")
    t_fused = timeit(fused, *args, iters=iters)

    # bytes over the wire per device per direction (keys+val+payload int64)
    shuf_bytes = 2 * 3 * 8 * ndev * capacity
    return {"ndev": ndev, "rows_total": 2 * n, "per_dev": per_dev,
            "capacity": capacity, "join_capacity": join_capacity,
            "shuffle_s": round(t_shuf, 4), "local_s": round(t_local, 4),
            "fused_s": round(t_fused, 4),
            "shuffle_bytes_per_dev": shuf_bytes,
            "recv_rows_per_dev": ndev * capacity}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 19)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    out = []
    for ndev in args.devices:
        r = build(ndev, args.rows, args.iters)
        out.append(r)
        print(json.dumps(r), flush=True)
    with open("profile_dist.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
