"""Pallas kernels wired into the SQL execution path (VERDICT round-1 item 4:
kernels must be provably reached from SQL, not bench-only artifacts).

The seg_agg trace counter is the oracle that the fused post-sort aggregation
kernel actually traced into the compiled program — a silent XLA fallback makes
these tests red.  Runs in interpret mode on the CPU device path.
"""

import numpy as np
import pandas as pd
import pytest

from conftest import make_engine

from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS


def _bumped(counter: str):
    class Ctx:
        def __enter__(self):
            self.before = GLOBAL_METRICS.counters.get(counter, 0)
            return self

        def __exit__(self, *exc):
            self.after = GLOBAL_METRICS.counters.get(counter, 0)
            return False

        @property
        def hits(self):
            return self.after - self.before

    return Ctx()


@pytest.fixture(scope="module")
def engines():
    # bucket 32768+: table is padded to a superblock multiple
    rng = np.random.default_rng(7)
    n = 40_000
    data = {
        "k": rng.integers(0, 500, n).astype(np.int64),
        "v": rng.integers(0, 100_000, n).astype(np.int64),
    }
    dev = make_engine("device")
    dev.register("t", data)
    cpu = make_engine("cpu")
    cpu.catalog = dev.catalog
    return dev, cpu


def _parity(dev, cpu, sql, counter_hits_expected=True):
    with _bumped("pallas_seg_agg_trace") as c:
        got = dev.query(sql)
    assert got.metrics["backend"] == "device"
    if counter_hits_expected:
        assert c.hits >= 1, f"seg_agg kernel not traced for: {sql}"
    exp = cpu.query(sql)
    gdf = got.to_pandas().sort_values(got.to_pandas().columns.tolist()).reset_index(drop=True)
    edf = exp.to_pandas().sort_values(exp.to_pandas().columns.tolist()).reset_index(drop=True)
    pd.testing.assert_frame_equal(gdf, edf, check_dtype=False, rtol=1e-12)


def test_seg_agg_ride_shape(engines):
    dev, cpu = engines
    _parity(dev, cpu,
            "SELECT k, COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn, "
            "MAX(v) AS mx, AVG(v) AS a FROM t GROUP BY k")


def test_seg_agg_sum_only_payload_shape(engines):
    dev, cpu = engines
    _parity(dev, cpu, "SELECT k, SUM(v) AS s FROM t GROUP BY k")


def test_seg_agg_count_only(engines):
    dev, cpu = engines
    _parity(dev, cpu, "SELECT k, COUNT(*) AS n FROM t GROUP BY k")


def test_seg_agg_distinct(engines):
    dev, cpu = engines
    _parity(dev, cpu, "SELECT DISTINCT k FROM t")


@pytest.fixture(scope="module")
def engines_big():
    """Above the fused filter+agg kernel's one-block (64K rows) gate."""
    rng = np.random.default_rng(8)
    n = 70_000
    data = {
        "k": rng.integers(0, 500, n).astype(np.int64),
        "v": rng.integers(-50_000, 100_000, n).astype(np.int64),
        "w": rng.integers(0, 1_000, n).astype(np.int64),
        "f": rng.normal(size=n),
    }
    dev = make_engine("device")
    dev.register("t", data)
    cpu = make_engine("cpu")
    cpu.catalog = dev.catalog
    return dev, cpu


def _parity_fa(dev, cpu, sql, hits=True):
    with _bumped("pallas_filter_agg_trace") as c:
        got = dev.query(sql)
    assert got.metrics["backend"] == "device"
    if hits:
        assert c.hits >= 1, f"filter_agg kernel not traced for: {sql}"
    else:
        assert c.hits == 0, f"filter_agg kernel unexpectedly traced for: {sql}"
    exp = cpu.query(sql)
    gdf = got.to_pandas().reset_index(drop=True)
    edf = exp.to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(gdf, edf, check_dtype=False, rtol=1e-12)


def test_filter_agg_fused_all_funcs(engines_big):
    dev, cpu = engines_big
    _parity_fa(dev, cpu,
               "SELECT COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn, "
               "MAX(v) AS mx, AVG(v) AS a FROM t WHERE v > 500")


def test_filter_agg_fused_distinct_filter_column(engines_big):
    dev, cpu = engines_big
    _parity_fa(dev, cpu,
               "SELECT COUNT(*) AS n, SUM(v) AS s, MAX(w) AS mw "
               "FROM t WHERE w <= 350")


def test_filter_agg_fused_flipped_literal(engines_big):
    dev, cpu = engines_big
    _parity_fa(dev, cpu, "SELECT SUM(v) AS s FROM t WHERE 500 < v")
    _parity_fa(dev, cpu, "SELECT COUNT(w) AS c FROM t WHERE v != 0")


def test_filter_agg_fused_empty_match(engines_big):
    dev, cpu = engines_big
    # no row matches: COUNT = 0, SUM/MIN/MAX NULL — parity with the oracle
    _parity_fa(dev, cpu,
               "SELECT COUNT(*) AS n, SUM(v) AS s, MIN(v) AS mn "
               "FROM t WHERE v > 2000000")


def test_filter_agg_not_fused_shapes(engines_big):
    dev, cpu = engines_big
    # float predicate column: not int32-narrowable -> XLA mask path
    _parity_fa(dev, cpu, "SELECT COUNT(*) AS n FROM t WHERE f > 0.5",
               hits=False)
    # grouped aggregate -> seg_agg/XLA, not the global fused kernel
    _parity_fa(dev, cpu,
               "SELECT k, COUNT(*) AS n FROM t WHERE v > 500 GROUP BY k "
               "ORDER BY k", hits=False)


def test_filter_agg_wide_aggregate_falls_back(engines_big):
    """ADVICE r4 #1: 1 filter + 6 distinct value columns = 7 double-buffered
    VMEM streams — over the scoped-VMEM budget at the minimum block, so the
    matcher must take the XLA mask path instead of a rejected Mosaic
    compile."""
    rng = np.random.default_rng(21)
    n = 70_000
    data = {c: rng.integers(0, 1000, n).astype(np.int64)
            for c in ("a", "b", "c", "d", "e", "g", "h")}
    dev = make_engine("device")
    dev.register("w", data)
    cpu = make_engine("cpu")
    cpu.catalog = dev.catalog
    sql = ("SELECT SUM(a) AS sa, SUM(b) AS sb, SUM(c) AS sc, SUM(d) AS sd, "
           "SUM(e) AS se, SUM(g) AS sg FROM w WHERE h > 500")
    _parity_fa(dev, cpu, sql, hits=False)
    # 4 value streams + filter still fits: the kernel must keep engaging
    sql5 = ("SELECT SUM(a) AS sa, SUM(b) AS sb, SUM(c) AS sc, SUM(d) AS sd "
            "FROM w WHERE h > 500")
    _parity_fa(dev, cpu, sql5, hits=True)


def test_use_pallas_false_still_correct(engines):
    _, cpu = engines
    dev2 = make_engine("device", use_pallas=False)
    dev2.catalog = cpu.catalog
    sql = "SELECT k, SUM(v) AS s, MIN(v) AS mn FROM t GROUP BY k"
    with _bumped("pallas_seg_agg_trace") as c:
        got = dev2.query(sql)
    assert c.hits == 0
    exp = cpu.query(sql)
    gdf = got.to_pandas().sort_values(["k"]).reset_index(drop=True)
    edf = exp.to_pandas().sort_values(["k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gdf, edf, check_dtype=False)


def test_multikey_packed_groupby_matches_oracle():
    """Multi-key GROUP BY with zone-map-packable keys folds into one int32
    code (device.py packing) and engages the seg_agg hot path; results must
    decode exactly — including negative ranges and dictionary keys."""
    import numpy as np
    import pandas as pd

    from gpu_olap_tpu import EngineConfig, OlapEngine
    from gpu_olap_tpu.utils.metrics import GLOBAL_METRICS

    rng = np.random.default_rng(77)
    n = 1 << 15
    k1 = rng.integers(-8, 40, n).astype(np.int64)
    s = np.array(["x", "y", "zz"])[rng.integers(0, 3, n)]
    v = rng.integers(-50, 50, n).astype(np.int64)

    def run(backend):
        eng = OlapEngine(EngineConfig(backend=backend,
                                      min_shape_bucket=1 << 14))
        eng.register("t", {"k1": k1, "s": s, "v": v})
        return (eng.query("SELECT k1, s, SUM(v) sv, MIN(v) mn, COUNT(*) c "
                          "FROM t GROUP BY k1, s")
                .to_pandas().sort_values(["k1", "s"]).reset_index(drop=True))

    before = GLOBAL_METRICS.counters.get("pallas_seg_agg_trace", 0)
    dev = run("device")
    assert GLOBAL_METRICS.counters.get("pallas_seg_agg_trace", 0) > before, \
        "packed multi-key shape should engage the Pallas seg_agg path"
    cpu = run("cpu")
    pd.testing.assert_frame_equal(cpu, dev, check_dtype=False)
