"""Pallas kernel tests — run in interpreter mode on CPU (compiled mode is
exercised on real TPU by bench --pallas)."""

import numpy as np
import pytest

import jax

from gpu_olap_tpu.ops.pallas import filter_agg, partition, seg_agg


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_filter_count_sum_i32():
    rng = np.random.default_rng(0)
    n = 100_000
    v = rng.integers(0, 1000, n).astype(np.int32)
    n_valid = n - 5000  # padded tail must be ignored
    cnt, s = filter_agg.filter_count_sum_i32(jax.numpy.asarray(v), 500, n_valid)
    exp_mask = (v[:n_valid] > 500)
    assert int(cnt) == exp_mask.sum()
    np.testing.assert_allclose(float(s), v[:n_valid][exp_mask].sum(), rtol=1e-6)


def test_filter_count_sum_exact_i32():
    rng = np.random.default_rng(1)
    n = 70_000  # non multiple of block
    v = rng.integers(0, 1 << 30, n).astype(np.int32)
    cnt, s = filter_agg.filter_count_sum_exact_i32(jax.numpy.asarray(v),
                                                   1 << 29, n)
    mask = v > (1 << 29)
    assert int(cnt) == mask.sum()
    assert int(s) == int(v[mask].astype(np.int64).sum())  # bit exact


def test_radix_histogram():
    rng = np.random.default_rng(2)
    n = 40_000
    keys = rng.integers(0, 1 << 20, n).astype(np.int32)
    hist = partition.radix_histogram_i32(jax.numpy.asarray(keys), shift=0)
    exp = np.bincount(keys & 0xFF, minlength=256)
    np.testing.assert_array_equal(np.asarray(hist), exp)
    hist8 = partition.radix_histogram_i32(jax.numpy.asarray(keys), shift=8)
    exp8 = np.bincount((keys >> 8) & 0xFF, minlength=256)
    np.testing.assert_array_equal(np.asarray(hist8), exp8)
    offs = partition.partition_offsets(hist)
    assert int(np.asarray(offs)[0]) == 0
    assert int(np.asarray(offs)[-1]) == n - exp[-1]


def _seg_agg_oracle(keys, vals):
    """NumPy oracle: per-run key/count/sum/min/max over sorted (keys, vals)."""
    flags = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(flags)
    ends = np.concatenate([starts[1:], [len(keys)]])
    out = []
    for s, e in zip(starts, ends):
        seg = vals[s:e].astype(np.int64)
        out.append((keys[s], e - s, seg.sum(), seg.min(), seg.max()))
    return out


def _run_seg_agg(keys, vals, max_groups):
    k, c, s, mn, mx, ng = seg_agg.seg_agg_sorted_i32(
        jax.numpy.asarray(keys), jax.numpy.asarray(vals), max_groups, True)
    ng = int(ng)
    return (np.asarray(k), np.asarray(c), np.asarray(s),
            np.asarray(mn), np.asarray(mx), ng)


def _check_seg_agg(keys, vals, max_groups=None):
    exp = _seg_agg_oracle(keys, vals)
    if max_groups is None:
        max_groups = len(exp) + 8
    k, c, s, mn, mx, ng = _run_seg_agg(keys, vals, max_groups)
    assert ng == len(exp)
    for g, (ek, ec, es, emn, emx) in enumerate(exp):
        assert k[g] == ek, (g, k[g], ek)
        assert c[g] == ec, (g, c[g], ec)
        assert s[g] == es, (g, s[g], es)
        assert mn[g] == emn, (g, mn[g], emn)
        assert mx[g] == emx, (g, mx[g], emx)


def test_seg_agg_basic_runs():
    """Random duplicate-heavy sorted keys, one superblock."""
    rng = np.random.default_rng(10)
    n = seg_agg.SB
    keys = np.sort(rng.integers(0, n // 16, n)).astype(np.int32)
    # ride-the-sort invariant: values ascend within each group
    vals = rng.integers(-1_000_000, 1_000_000, n).astype(np.int32)
    order = np.lexsort((vals, keys))
    _check_seg_agg(keys, vals[order])


def test_seg_agg_superblock_boundary_carry():
    """Groups spanning chunk and superblock boundaries; 2 grid steps."""
    n = 2 * seg_agg.SB
    # one giant group covering all of superblock 0 and half of superblock 1,
    # then alternating tiny groups
    keys = np.empty(n, dtype=np.int32)
    half = n // 2 + seg_agg.SB // 2
    keys[:half] = 7
    keys[half:] = 100 + np.arange(n - half, dtype=np.int32) // 3
    vals = np.arange(n, dtype=np.int32) % 4096
    order = np.lexsort((vals, keys))
    _check_seg_agg(keys[order], vals[order])


def test_seg_agg_every_row_new_group():
    """nloc == CHUNK stress: all keys distinct."""
    n = seg_agg.SB
    keys = np.arange(n, dtype=np.int32) * 3 - n
    vals = np.full(n, -5, dtype=np.int32)
    _check_seg_agg(keys, vals, max_groups=n + 4)


def test_seg_agg_sentinel_padding():
    """Padded rows masked to INT32_MAX form one trailing sentinel group."""
    rng = np.random.default_rng(11)
    n = seg_agg.SB
    n_valid = n - 12345
    keys = np.full(n, np.iinfo(np.int32).max, dtype=np.int32)
    keys[:n_valid] = np.sort(rng.integers(0, 500, n_valid)).astype(np.int32)
    vals = np.zeros(n, dtype=np.int32)
    vals[:n_valid] = rng.integers(0, 1000, n_valid).astype(np.int32)
    order = np.lexsort((vals[:n_valid], keys[:n_valid]))
    keys[:n_valid] = keys[:n_valid][order]
    vals[:n_valid] = vals[:n_valid][order]
    exp = _seg_agg_oracle(keys[:n_valid], vals[:n_valid])
    k, c, s, mn, mx, ng = _run_seg_agg(keys, vals, len(exp) + 8)
    assert ng == len(exp) + 1  # + sentinel group
    for g, (ek, ec, es, emn, emx) in enumerate(exp):
        assert (k[g], c[g], s[g], mn[g], mx[g]) == (ek, ec, es, emn, emx)
    assert k[len(exp)] == np.iinfo(np.int32).max
    assert c[len(exp)] == n - n_valid


def test_seg_agg_overflow_exact_count():
    """Capacity overflow drops trailing groups but n_groups stays exact."""
    n = seg_agg.SB
    keys = np.arange(n, dtype=np.int32)
    vals = np.ones(n, dtype=np.int32)
    k, c, s, mn, mx, ng = _run_seg_agg(keys, vals, 64)
    assert ng == n
    assert k[0] == 0 and c[0] == 1 and s[0] == 1
