"""Pallas kernel tests — run in interpreter mode on CPU (compiled mode is
exercised on real TPU by bench --pallas)."""

import numpy as np
import pytest

import jax

from gpu_olap_tpu.ops.pallas import filter_agg, partition


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
