"""Distributed shuffle / join / group-by tests on the 8-virtual-device CPU
mesh (SURVEY.md §4 multi-device strategy — the reference has no analogue)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpu_olap_tpu.parallel import dist_ops, mesh as mesh_mod, shuffle, skew
from gpu_olap_tpu.parallel.mesh import AXIS


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh(8)


def _shard(mesh, arr):
    return jax.device_put(arr, mesh_mod.row_sharding(mesh))


def test_mesh_has_8_devices(mesh8):
    assert mesh8.devices.size == 8


def test_shuffle_partitions_by_hash(mesh8):
    n = 8 * 512
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1000, n).astype(np.int64)
    vals = rng.integers(0, 10**9, n).astype(np.int64)
    valid = np.ones(n, dtype=bool)

    fn = shuffle.make_shuffle(mesh8, n_payloads=1, capacity=256)
    rk, rv, rvalid, overflow = fn(
        _shard(mesh8, keys), _shard(mesh8, valid), _shard(mesh8, vals)
    )
    assert not bool(np.asarray(overflow).max())
    rk, rv, rvalid = map(np.asarray, (rk, rv, rvalid))
    # multiset of (key, val) pairs preserved
    got = sorted(zip(rk[rvalid], rv[rvalid]))
    exp = sorted(zip(keys, vals))
    assert got == exp
    # every key lives on exactly one device
    per_dev = rk.reshape(8, -1)
    per_valid = rvalid.reshape(8, -1)
    owner = {}
    for d in range(8):
        for k in np.unique(per_dev[d][per_valid[d]]):
            assert owner.setdefault(k, d) == d


def test_shuffle_overflow_flag(mesh8):
    n = 8 * 512
    keys = np.zeros(n, dtype=np.int64)  # all rows -> one device
    valid = np.ones(n, dtype=bool)
    fn = shuffle.make_shuffle(mesh8, n_payloads=0, capacity=64)
    rk, rvalid, overflow = fn(_shard(mesh8, keys), _shard(mesh8, valid))
    assert bool(np.asarray(overflow).max())


def test_dist_groupby_matches_pandas(mesh8):
    import pandas as pd

    n = 8 * 1024
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 200, n).astype(np.int64)
    vals = rng.integers(-100, 100, n).astype(np.int64)
    valid = np.ones(n, dtype=bool)

    fn = dist_ops.make_dist_groupby(
        mesh8, [{"func": "sum", "acc_dtype": np.int64},
                {"func": "count", "acc_dtype": np.int64}],
        capacity=1024, max_groups=512,
    )
    gkeys, (sums, counts), gvalid, _ = fn(
        _shard(mesh8, keys), _shard(mesh8, valid), _shard(mesh8, vals),
        _shard(mesh8, vals),
    )
    gkeys, sums, counts, gvalid = map(np.asarray, (gkeys, sums, counts, gvalid))
    got = pd.DataFrame({"k": gkeys[gvalid], "s": sums[gvalid],
                        "c": counts[gvalid]}).sort_values("k").reset_index(drop=True)
    exp = (pd.DataFrame({"k": keys, "v": vals}).groupby("k")
           .agg(s=("v", "sum"), c=("v", "count")).reset_index())
    assert got.k.tolist() == exp.k.tolist()
    assert got.s.tolist() == exp.s.tolist()
    assert got.c.tolist() == exp.c.tolist()


def test_dist_join_matches_pandas(mesh8):
    import pandas as pd

    nl, nr = 8 * 512, 8 * 256
    rng = np.random.default_rng(2)
    lk = rng.integers(0, 300, nl).astype(np.int64)
    lv = np.arange(nl, dtype=np.int64)
    rk = rng.integers(100, 400, nr).astype(np.int64)
    rv = np.arange(nr, dtype=np.int64) + 10**6

    fn = dist_ops.make_dist_join(
        mesh8, capacity=1024, join_capacity=8192,
        n_left_payloads=1, n_right_payloads=1,
    )
    key, (olv,), (orv,), ovalid, _total = fn(
        _shard(mesh8, lk), _shard(mesh8, np.ones(nl, bool)),
        _shard(mesh8, rk), _shard(mesh8, np.ones(nr, bool)),
        _shard(mesh8, lv), _shard(mesh8, rv),
    )
    key, olv, orv, ovalid = map(np.asarray, (key, olv, orv, ovalid))
    got = sorted(zip(key[ovalid], olv[ovalid], orv[ovalid]))
    exp_df = pd.DataFrame({"k": lk, "lv": lv}).merge(
        pd.DataFrame({"k": rk, "rv": rv}), on="k")
    exp = sorted(zip(exp_df.k, exp_df.lv, exp_df.rv))
    assert got == exp


def test_dist_join_groupby_step(mesh8):
    import pandas as pd

    nl, nr = 8 * 512, 8 * 128
    rng = np.random.default_rng(3)
    lk = rng.integers(0, 64, nl).astype(np.int64)
    lv = rng.integers(1, 10, nl).astype(np.int64)
    rk = np.arange(64, dtype=np.int64).repeat(16)  # 1024 = 8*128 rows
    rv = rng.integers(1, 5, nr).astype(np.int64)

    fn = dist_ops.make_dist_join_groupby(
        mesh8, capacity=2048, join_capacity=65536, max_groups=256,
        agg_funcs=("sum", "count"),
    )
    gk, (s, c), gvalid, overflow = fn(
        _shard(mesh8, lk), _shard(mesh8, np.ones(nl, bool)), _shard(mesh8, lv),
        _shard(mesh8, rk), _shard(mesh8, np.ones(nr, bool)), _shard(mesh8, rv),
    )
    assert not bool(np.asarray(overflow))
    gk, s, c, gvalid = map(np.asarray, (gk, s, c, gvalid))
    got = pd.DataFrame({"k": gk[gvalid], "s": s[gvalid], "c": c[gvalid]}) \
        .sort_values("k").reset_index(drop=True)
    j = pd.DataFrame({"k": lk, "lv": lv}).merge(pd.DataFrame({"k": rk, "rv": rv}), on="k")
    j["m"] = j.lv * j.rv
    exp = j.groupby("k").agg(s=("m", "sum"), c=("m", "count")).reset_index()
    assert got.k.tolist() == exp.k.tolist()
    assert got.s.tolist() == exp.s.tolist()
    assert got.c.tolist() == exp.c.tolist()


def test_skew_detection():
    rng = np.random.default_rng(4)
    keys = np.concatenate([
        rng.integers(0, 1000, 5000),
        np.full(3000, 42),   # hot key
    ]).astype(np.int64)
    heavy = skew.detect_heavy_keys(keys, row_threshold=500)
    assert heavy.tolist() == [42]
    mask = np.asarray(skew.split_by_heavy(jnp.asarray(keys), heavy))
    assert mask.sum() == (keys == 42).sum()
    hist = np.asarray(skew.partition_histogram(jnp.asarray(keys), 8))
    assert hist.sum() == len(keys)
    cap = skew.recommend_capacity(hist)
    assert cap >= hist.max()


def test_skew_hybrid_join_groupby(mesh8):
    """Zipfian probe keys: heavy keys broadcast, light keys shuffled; results
    merged on host (heavy-key partials appear on several devices)."""
    import pandas as pd

    rng = np.random.default_rng(9)
    n = 8 * 1024
    # hot key 7 dominates
    lk = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 64, n)).astype(np.int64)
    lv = rng.integers(1, 10, n).astype(np.int64)
    rk = np.arange(64, dtype=np.int64).repeat(4)  # 256 build rows, 4 dups/key
    rk = np.resize(rk, 8 * 32)
    rv = rng.integers(1, 5, rk.shape[0]).astype(np.int64)

    heavy = skew.detect_heavy_keys(lk, row_threshold=n // 10)
    assert 7 in heavy.tolist()

    fn = dist_ops.make_dist_join_groupby_skew(
        mesh8, capacity=2048, join_capacity=65536, max_groups=256,
        agg_funcs=("sum", "count"), heavy_keys=heavy, heavy_build_cap=64,
    )
    gk, (s, c), gvalid, overflow = fn(
        _shard(mesh8, lk), _shard(mesh8, np.ones(n, bool)), _shard(mesh8, lv),
        _shard(mesh8, rk), _shard(mesh8, np.ones(rk.shape[0], bool)), _shard(mesh8, rv),
    )
    assert not bool(np.asarray(overflow))
    gk, s, c, gvalid = map(np.asarray, (gk, s, c, gvalid))
    got = (pd.DataFrame({"k": gk[gvalid], "s": s[gvalid], "c": c[gvalid]})
           .groupby("k").sum().reset_index())  # host merge of heavy partials
    j = pd.DataFrame({"k": lk, "lv": lv}).merge(
        pd.DataFrame({"k": rk, "rv": rv}), on="k")
    j["m"] = j.lv * j.rv
    exp = j.groupby("k").agg(s=("m", "sum"), c=("m", "count")).reset_index()
    assert got.k.tolist() == exp.k.tolist()
    assert got.s.tolist() == exp.s.tolist()
    assert got.c.tolist() == exp.c.tolist()


def test_shuffle_volume_scales_inverse_ndev():
    """CI pin for the round-1 scaling-collapse class of bug (DIST_ANALYSIS.md):
    with a fixed TOTAL table, per-device receive volume (ndev * bucket
    capacity) must shrink ~1/ndev as the mesh grows.  Sizing buckets from the
    full-table histogram peak WITHOUT dividing by ndev (the round-1 bug) makes
    recv rows/device constant — this test fails loudly in that case."""
    total = 1 << 17
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, total // 16, total).astype(np.int64))

    recv_per_dev = {}
    for ndev in (2, 4, 8):
        hist = np.asarray(skew.partition_histogram(keys, ndev))
        cap = skew.recommend_capacity(hist, ndev, headroom=1.25)
        recv_per_dev[ndev] = ndev * cap

    # 2 -> 8 devices must cut per-device receive volume by ~4x (allow 30%
    # slack for histogram imbalance + alignment rounding); the broken sizing
    # yields a ratio of ~1.0 and fails by an order of magnitude
    ratio = recv_per_dev[2] / recv_per_dev[8]
    assert ratio > 2.8, f"recv rows/device not scaling 1/ndev: {recv_per_dev}"
    # and monotone decreasing across the sweep
    assert recv_per_dev[2] > recv_per_dev[4] > recv_per_dev[8], recv_per_dev


def test_dist_step_overflow_flag_reports(mesh8):
    """The fused join+group-by step must surface capacity overflow instead of
    silently dropping rows (ADVICE r2: benches previously discarded it)."""
    n = 8 * 512
    keys = np.zeros(n, dtype=np.int64)  # every row hashes to one device
    vals = np.ones(n, dtype=np.int64)
    fn = dist_ops.make_dist_join_groupby(
        mesh8, capacity=64, join_capacity=4096, max_groups=64,
        agg_funcs=("sum",),
    )
    out = fn(_shard(mesh8, keys), _shard(mesh8, np.ones(n, bool)),
             _shard(mesh8, vals),
             _shard(mesh8, keys), _shard(mesh8, np.ones(n, bool)),
             _shard(mesh8, vals))
    assert bool(np.asarray(out[3]))
