"""Concurrent query execution (reference: async tokio engine + DashMap
catalog, ``gpu-olap-core/src/lib.rs:52``, ``catalog.rs:12``).

The engine exposes ``query_async`` (Future) / ``aquery`` (asyncio); planning
runs concurrently, device programs serialize on the accelerator, the CPU
oracle runs fully parallel.  These tests hammer one engine from many threads
and check every result against the single-threaded answer.
"""

import asyncio
from concurrent.futures import wait

import numpy as np
import pandas as pd
import pytest

from conftest import make_engine


@pytest.fixture(scope="module", params=["cpu", "device"])
def eng(request):
    e = make_engine(request.param)
    rng = np.random.default_rng(3)
    n = 20_000
    e.register("t", {
        "k": rng.integers(0, 50, n).astype(np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    e.register("u", {
        "k": np.arange(50, dtype=np.int64),
        "w": rng.integers(0, 10, 50).astype(np.int64),
    })
    yield e
    e.shutdown()


QUERIES = [
    "SELECT COUNT(*) AS n FROM t",
    "SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k",
    "SELECT COUNT(*) AS n, SUM(v) AS s FROM t WHERE v > 500",
    "SELECT t.k, SUM(t.v + u.w) AS s FROM t JOIN u ON t.k = u.k "
    "GROUP BY t.k ORDER BY t.k",
    "SELECT DISTINCT k FROM t ORDER BY k LIMIT 10",
]


def _expected(eng):
    return {sql: eng.query(sql).to_pandas() for sql in QUERIES}


def test_query_async_parallel_correctness(eng):
    exp = _expected(eng)
    futs = [(sql, eng.query_async(sql)) for sql in QUERIES * 6]
    done, not_done = wait([f for _, f in futs], timeout=300)
    assert not not_done
    for sql, f in futs:
        pd.testing.assert_frame_equal(f.result().to_pandas(), exp[sql],
                                      check_dtype=False)


def test_query_async_future_api(eng):
    f = eng.query_async("SELECT COUNT(*) AS n FROM t")
    r = f.result(timeout=120)
    assert int(r.to_pydict()["n"][0]) == 20_000


def test_aquery_asyncio_gather(eng):
    exp = _expected(eng)

    async def run():
        results = await asyncio.gather(*(eng.aquery(sql) for sql in QUERIES))
        return dict(zip(QUERIES, results))

    got = asyncio.run(run())
    for sql, r in got.items():
        pd.testing.assert_frame_equal(r.to_pandas(), exp[sql],
                                      check_dtype=False)


def test_concurrent_registration_and_queries(eng):
    """Catalog writes (new tables) interleaved with queries on other tables."""
    rng = np.random.default_rng(9)

    def register_and_query(i):
        name = f"side_{i}"
        eng.register(name, {"x": rng.integers(0, 5, 1000).astype(np.int64)})
        r = eng.query(f"SELECT COUNT(*) AS n FROM {name}")
        eng.drop_table(name)
        return int(r.to_pydict()["n"][0])

    futs = [eng._get_pool().submit(register_and_query, i) for i in range(8)]
    futs += [eng.query_async("SELECT COUNT(*) AS n FROM t") for _ in range(8)]
    done, not_done = wait(futs, timeout=300)
    assert not not_done
    for f in futs:
        assert f.result is not None and f.exception() is None


def test_result_cache_threadsafe():
    e = make_engine("cpu", enable_cache=True)
    e.register("t", {"v": np.arange(1000, dtype=np.int64)})
    sql = "SELECT SUM(v) AS s FROM t"
    futs = [e.query_async(sql) for _ in range(16)]
    done, not_done = wait(futs, timeout=120)
    assert not not_done
    vals = {int(f.result().to_pydict()["s"][0]) for f in futs}
    assert vals == {499500}
    backends = {f.result().meta["backend"] for f in futs}
    assert "result-cache" in backends  # later hits served from the cache
    e.shutdown()
