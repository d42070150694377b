"""Test configuration.

Multi-device testing strategy per SURVEY.md §4: force the JAX CPU platform with
8 virtual devices so mesh/shard_map paths compile and run without TPU hardware.
Must run before any ``import jax``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize force-registers the TPU-tunnel platform; tests run on
# the virtual 8-device CPU mesh (SURVEY.md §4 multi-device strategy)
jax.config.update("jax_platforms", "cpu")

# persistent compile cache for the suite: CPU compiles of the big traced
# programs (streamed steps, dist shard_maps) dominate suite wall time; the
# cache keys on HLO so re-runs after unrelated edits skip them
try:
    os.makedirs("/tmp/gpu_olap_test_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpu_olap_test_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass

import numpy as np
import pytest

from gpu_olap_tpu import EngineConfig, OlapEngine


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_engine(backend: str = "cpu", **kwargs) -> OlapEngine:
    return OlapEngine(EngineConfig(backend=backend, **kwargs))


@pytest.fixture
def cpu_engine():
    return make_engine("cpu")


@pytest.fixture
def device_engine():
    return make_engine("device")


@pytest.fixture
def sales_data(rng):
    n = 5000
    return {
        "product_id": rng.integers(0, 50, n),
        "amount": rng.normal(100.0, 50.0, n),
        "quantity": rng.integers(1, 100, n),
        "customer_id": rng.integers(0, 200, n),
        "region": rng.choice(["EU", "US", "APAC", "LATAM"], n),
        "year": rng.integers(2020, 2026, n),
    }


@pytest.fixture
def customers_data(rng):
    n = 200
    return {
        "customer_id": np.arange(n),
        "customer_name": np.array([f"cust{i:03d}" for i in range(n)]),
        "region": rng.choice(["EU", "US", "APAC", "LATAM"], n),
        "credit": rng.integers(0, 10_000, n),
    }


def assert_result_equal(result, expected: dict, sort_by=None, approx=True):
    """Compare a QueryResult against a dict of expected columns as multisets
    (row order compared only after sorting by ``sort_by``)."""
    got = result.to_pydict()
    assert set(got) == set(expected), (sorted(got), sorted(expected))
    n = len(next(iter(expected.values()))) if expected else 0
    assert result.num_rows == n
    if sort_by is not None:
        import pandas as pd

        gdf = pd.DataFrame(got).sort_values(sort_by).reset_index(drop=True)
        edf = pd.DataFrame(expected).sort_values(sort_by).reset_index(drop=True)
    else:
        import pandas as pd

        gdf = pd.DataFrame(got)
        edf = pd.DataFrame(expected)
    for col in expected:
        g = gdf[col].to_numpy()
        e = edf[col].to_numpy()
        if approx and g.dtype.kind == "f":
            np.testing.assert_allclose(g.astype(float), e.astype(float), rtol=1e-9,
                                       err_msg=f"column {col}")
        else:
            np.testing.assert_array_equal(g, e, err_msg=f"column {col}")
