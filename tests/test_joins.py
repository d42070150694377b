

def test_presorted_build_auto_sort_merge():
    """Catalog sortedness statistic auto-selects the sort-merge strategy and
    the executor's build sort collapses to a sentinel mask — results must
    still match the oracle exactly (reference join_kernel.rs:10-14)."""
    import numpy as np

    from gpu_olap_tpu import EngineConfig, OlapEngine

    rng = np.random.default_rng(31)
    nb = 5000
    # sorted build key WITH duplicates (defeats the unique-key lookup path)
    bk = np.sort(rng.integers(0, nb // 2, nb)).astype(np.int64)
    pk = rng.integers(0, nb // 2, 8000).astype(np.int64)

    def mk(backend):
        eng = OlapEngine(EngineConfig(backend=backend, min_shape_bucket=256))
        eng.register("b", {"k": bk, "w": np.arange(nb, dtype=np.int64)})
        eng.register("p", {"k": pk})
        return eng

    dev = mk("device")
    got = dev.query("SELECT COUNT(*) AS n, SUM(b.w) AS s "
                    "FROM p JOIN b ON p.k = b.k").to_pydict()
    exp = mk("cpu").query("SELECT COUNT(*) AS n, SUM(b.w) AS s "
                          "FROM p JOIN b ON p.k = b.k").to_pydict()
    assert got == exp
    # the statistic engaged (build side is small -> broadcast threshold may
    # win; force the check on the planner-level stat instead)
    assert dev.catalog.ensure_sorted_stat("b", "k") is True
    assert dev.catalog.ensure_sorted_stat("p", "k") is False


def test_presorted_stat_respects_nulls_and_order():
    import numpy as np

    from gpu_olap_tpu import EngineConfig, OlapEngine

    eng = OlapEngine(EngineConfig(backend="cpu"))
    eng.register("t", {"a": np.array([3, 1, 2], dtype=np.int64),
                       "b": np.array([1, 2, 3], dtype=np.int64)})
    assert eng.catalog.ensure_sorted_stat("t", "a") is False
    assert eng.catalog.ensure_sorted_stat("t", "b") is True
