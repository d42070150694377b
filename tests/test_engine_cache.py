"""Query result cache tests (enable_cache — documented in the reference but
unused, lib.rs:29-30)."""

import numpy as np

from conftest import make_engine


def test_result_cache_hit_and_invalidation():
    eng = make_engine("cpu", enable_cache=True)
    eng.register("t", {"a": np.arange(10)})
    r1 = eng.query("SELECT SUM(a) AS s FROM t")
    assert r1.metrics["backend"] == "cpu"
    r2 = eng.query("SELECT SUM(a) AS s FROM t")
    assert r2.metrics["backend"] == "result-cache"
    assert r2.to_pydict()["s"][0] == 45
    # re-registering the table invalidates
    eng.register("t", {"a": np.arange(20)})
    r3 = eng.query("SELECT SUM(a) AS s FROM t")
    assert r3.metrics["backend"] == "cpu"
    assert r3.to_pydict()["s"][0] == 190


def test_cache_disabled():
    eng = make_engine("cpu", enable_cache=False)
    eng.register("t", {"a": np.arange(10)})
    eng.query("SELECT SUM(a) AS s FROM t")
    r = eng.query("SELECT SUM(a) AS s FROM t")
    assert r.metrics["backend"] == "cpu"
