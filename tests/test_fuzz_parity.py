"""Randomized query fuzzing: generated SQL over generated data, device
executor vs NumPy oracle.  Catches interaction bugs the hand-written corpus
misses (null propagation x joins x aggregates x sorts)."""

import numpy as np
import pandas as pd
import pytest

from conftest import make_engine

N_QUERIES = 60


def _gen_tables(rng):
    n = rng.integers(200, 2000)
    t1 = {
        "a": rng.integers(-50, 50, n).astype(np.int64),
        "b": rng.integers(0, 10, n).astype(np.int64),
        "c": rng.normal(0, 100, n),
        "s": rng.choice(["x", "y", "z", "w"], n),
    }
    # sprinkle nulls into the float column
    mask = rng.random(n) < 0.2
    t1["c"] = np.where(mask, np.nan, t1["c"])
    m = rng.integers(50, 500)
    t2 = {
        "b": rng.integers(0, 12, m).astype(np.int64),
        "w": rng.integers(0, 1000, m).astype(np.int64),
    }
    return t1, t2


_AGGS = ["COUNT(*)", "SUM(t.a)", "AVG(t.c)", "MIN(t.a)", "MAX(t.c)",
         "COUNT(t.c)", "COUNT(DISTINCT t.b)", "SUM(t.a + t.b)", "MAX(t.s)",
         "SUM(DISTINCT t.a)", "AVG(DISTINCT t.b)"]
# build-side and decomposable mixed-side arguments (round-5 sorted-space
# join aggregation paths)
_AGGS_JOIN = ["SUM(t2.w)", "MIN(t2.w)", "SUM(t.a + t2.w)",
              "AVG(t.b + t2.w)", "MAX(t2.w)", "SUM(t.a * t2.w)"]
_PREDS = ["t.a > 0", "t.b IN (1, 2, 3)", "t.c IS NOT NULL", "t.s = 'x'",
          "t.a BETWEEN -10 AND 25", "t.c > 50 OR t.b < 2", "NOT t.s = 'y'",
          "t.a % 3 = 0"]


def _gen_query(rng):
    parts = ["SELECT"]
    use_join = rng.random() < 0.35
    group = rng.random() < 0.6
    glob = not group and rng.random() < 0.4  # global aggregate shape
    sel = []
    pool = list(_AGGS) + (list(_AGGS_JOIN) if use_join else [])
    if group:
        keys = list(rng.choice(["b", "s"], size=rng.integers(1, 3), replace=False))
        sel += [f"t.{k}" for k in keys]
        n_aggs = rng.integers(1, 4)
        aggs = list(rng.choice(pool, size=n_aggs, replace=False))
        sel += [f"{a} AS agg{i}" for i, a in enumerate(aggs)]
    elif glob:
        n_aggs = rng.integers(1, 5)
        aggs = list(rng.choice(pool, size=n_aggs, replace=False))
        sel = [f"{a} AS agg{i}" for i, a in enumerate(aggs)]
    else:
        sel = ["t.a", "t.b", "t.c"]
    parts.append(", ".join(sel))
    if use_join:
        parts.append("FROM t1 t JOIN t2 ON t.b = t2.b")
    else:
        parts.append("FROM t1 t")
    if rng.random() < 0.7:
        n_preds = rng.integers(1, 3)
        preds = rng.choice(_PREDS, size=n_preds, replace=False)
        parts.append("WHERE " + " AND ".join(preds))
    if group:
        parts.append("GROUP BY " + ", ".join(f"t.{k}" for k in keys))
        if rng.random() < 0.3:
            parts.append("HAVING COUNT(*) > 2")
    if rng.random() < 0.4:
        if rng.random() < 0.5:
            # LIMIT must have a total order to be deterministic: sort by all
            # output columns
            ordinals = ", ".join(
                str(i + 1) + (" DESC" if rng.random() < 0.5 else "")
                for i in range(len(sel)))
            parts.append("ORDER BY " + ordinals)
            parts.append(f"LIMIT {int(rng.integers(1, 50))}")
        else:
            parts.append("ORDER BY 1" + (" DESC" if rng.random() < 0.5 else ""))
    return " ".join(parts)


@pytest.mark.parametrize("seed", range(N_QUERIES))
def test_fuzz_device_matches_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    t1, t2 = _gen_tables(rng)
    sql = _gen_query(rng)

    dev = make_engine("device", min_shape_bucket=256)
    dev.register("t1", t1)
    dev.register("t2", t2)
    cpu = make_engine("cpu")
    cpu.catalog = dev.catalog

    got = dev.query(sql)
    exp = cpu.query(sql)
    g = got.to_pandas()
    e = exp.to_pandas()
    assert list(g.columns) == list(e.columns), sql
    # compare as sorted multisets (ORDER BY without full tiebreak is
    # nondeterministic between backends)
    cols = list(g.columns)
    g = g.sort_values(cols).reset_index(drop=True)
    e = e.sort_values(cols).reset_index(drop=True)
    assert len(g) == len(e), f"{sql}: {len(g)} vs {len(e)}"
    for col in cols:
        gv, ev = g[col].to_numpy(), e[col].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            np.testing.assert_allclose(
                gv.astype(float), ev.astype(float),
                rtol=1e-9, atol=1e-9, equal_nan=True,
                err_msg=f"{sql} :: {col}")
        else:
            np.testing.assert_array_equal(gv, ev, err_msg=f"{sql} :: {col}")
