"""CPU oracle executor tests — full SQL semantics cross-checked against pandas.

The reference's executor is largely stubbed (scan returns empty batches,
``executor.rs:118-155``; join returns empty, ``:255-265``); these tests pin the
*intended* semantics (SURVEY.md §0) on a complete implementation.
"""

import numpy as np
import pandas as pd
import pytest

from conftest import assert_result_equal, make_engine


@pytest.fixture
def engine(sales_data, customers_data):
    eng = make_engine("cpu")
    eng.register("sales", sales_data)
    eng.register("customers", customers_data)
    return eng


def test_filter_projection(engine, sales_data):
    r = engine.query("SELECT product_id, amount FROM sales WHERE amount > 150")
    df = pd.DataFrame(sales_data)
    exp = df[df.amount > 150]
    assert_result_equal(r, {"product_id": exp.product_id.to_numpy(),
                            "amount": exp.amount.to_numpy()},
                        sort_by=["product_id", "amount"])


def test_compound_predicates(engine, sales_data):
    r = engine.query(
        "SELECT amount FROM sales WHERE (amount > 100 AND year = 2024) OR quantity < 5"
    )
    df = pd.DataFrame(sales_data)
    exp = df[((df.amount > 100) & (df.year == 2024)) | (df.quantity < 5)]
    assert_result_equal(r, {"amount": exp.amount.to_numpy()}, sort_by=["amount"])


def test_arithmetic_projection(engine, sales_data):
    r = engine.query("SELECT amount * quantity AS v FROM sales LIMIT 100000")
    df = pd.DataFrame(sales_data)
    assert_result_equal(r, {"v": (df.amount * df.quantity).to_numpy()}, sort_by=["v"])


def test_int_division_truncates(engine):
    eng = make_engine("cpu")
    eng.register("t", {"a": np.array([7, -7, 9]), "b": np.array([2, 2, 3])})
    r = eng.query("SELECT a / b AS q FROM t")
    # Rust i64 division truncates toward zero (executor.rs:434)
    assert list(r.to_pydict()["q"]) == [3, -3, 3]


def test_group_by_aggregates(engine, sales_data):
    r = engine.query(
        "SELECT region, COUNT(*) AS n, SUM(amount) AS s, AVG(amount) AS a, "
        "MIN(amount) AS mn, MAX(amount) AS mx FROM sales GROUP BY region"
    )
    df = pd.DataFrame(sales_data)
    exp = df.groupby("region").agg(
        n=("amount", "count"), s=("amount", "sum"), a=("amount", "mean"),
        mn=("amount", "min"), mx=("amount", "max"),
    ).reset_index()
    assert_result_equal(r, {c: exp[c].to_numpy() for c in exp.columns},
                        sort_by=["region"])


def test_group_by_multiple_keys(engine, sales_data):
    r = engine.query(
        "SELECT region, year, SUM(quantity) AS q FROM sales GROUP BY region, year"
    )
    df = pd.DataFrame(sales_data)
    exp = df.groupby(["region", "year"]).agg(q=("quantity", "sum")).reset_index()
    assert_result_equal(r, {c: exp[c].to_numpy() for c in exp.columns},
                        sort_by=["region", "year"])


def test_global_aggregate(engine, sales_data):
    r = engine.query("SELECT COUNT(*) AS n, SUM(quantity) AS s FROM sales")
    df = pd.DataFrame(sales_data)
    d = r.to_pydict()
    assert d["n"][0] == len(df)
    assert d["s"][0] == df.quantity.sum()


def test_sum_int64_exact(engine):
    eng = make_engine("cpu")
    big = np.array([2**53 + 1, 2**53 + 3, 5], dtype=np.int64)
    eng.register("t", {"a": big})
    r = eng.query("SELECT SUM(a) AS s FROM t")
    # int64 sums must be exact (bit-identical parity target) — float64 would lose this
    assert r.to_pydict()["s"][0] == int(big.sum())


def test_having(engine, sales_data):
    r = engine.query(
        "SELECT region, SUM(amount) AS s FROM sales GROUP BY region HAVING s > 100000"
    )
    df = pd.DataFrame(sales_data)
    exp = df.groupby("region").agg(s=("amount", "sum")).reset_index()
    exp = exp[exp.s > 100000]
    assert_result_equal(r, {c: exp[c].to_numpy() for c in exp.columns}, sort_by=["region"])


def test_count_distinct(engine, sales_data):
    r = engine.query(
        "SELECT region, COUNT(DISTINCT product_id) AS d FROM sales GROUP BY region"
    )
    df = pd.DataFrame(sales_data)
    exp = df.groupby("region").product_id.nunique().reset_index(name="d")
    assert_result_equal(r, {c: exp[c].to_numpy() for c in exp.columns}, sort_by=["region"])


def test_inner_join(engine, sales_data, customers_data):
    r = engine.query(
        "SELECT s.amount, c.customer_name FROM sales s "
        "JOIN customers c ON s.customer_id = c.customer_id"
    )
    sdf, cdf = pd.DataFrame(sales_data), pd.DataFrame(customers_data)
    exp = sdf.merge(cdf, on="customer_id")
    assert_result_equal(r, {"amount": exp.amount.to_numpy(),
                            "customer_name": exp.customer_name.to_numpy()},
                        sort_by=["amount", "customer_name"])


def test_left_join_nulls():
    eng = make_engine("cpu")
    eng.register("l", {"k": np.array([1, 2, 3]), "v": np.array([10, 20, 30])})
    eng.register("r", {"k": np.array([1, 1, 4]), "w": np.array([100, 200, 400])})
    res = eng.query("SELECT l.k, l.v, r.w FROM l LEFT JOIN r ON l.k = r.k")
    df = res.to_pandas().sort_values(["k", "w"]).reset_index(drop=True)
    assert list(df.k) == [1, 1, 2, 3]
    assert df.w.isna().sum() == 2


def test_right_and_full_join():
    eng = make_engine("cpu")
    eng.register("l", {"k": np.array([1, 2]), "v": np.array([10, 20])})
    eng.register("r", {"k": np.array([2, 3]), "w": np.array([200, 300])})
    res = eng.query("SELECT l.v, r.w FROM l RIGHT JOIN r ON l.k = r.k")
    df = res.to_pandas()
    assert len(df) == 2 and df.v.isna().sum() == 1
    res = eng.query("SELECT l.v, r.w FROM l FULL JOIN r ON l.k = r.k")
    df = res.to_pandas()
    assert len(df) == 3


def test_null_keys_never_join():
    eng = make_engine("cpu")
    eng.register("l", {"k": np.array([1.0, np.nan]), "v": np.array([1, 2])})
    eng.register("r", {"k": np.array([1.0, np.nan]), "w": np.array([10, 20])})
    res = eng.query("SELECT l.v, r.w FROM l JOIN r ON l.k = r.k")
    df = res.to_pandas()
    assert len(df) == 1 and df.v[0] == 1 and df.w[0] == 10


def test_join_with_residual(engine):
    eng = make_engine("cpu")
    eng.register("l", {"k": np.array([1, 1, 2]), "v": np.array([5, 15, 25])})
    eng.register("r", {"k": np.array([1, 2]), "lim": np.array([10, 20])})
    res = eng.query("SELECT l.v FROM l JOIN r ON l.k = r.k AND l.v > r.lim")
    assert sorted(res.to_pydict()["v"]) == [15, 25]


def test_multi_join(engine, sales_data, customers_data):
    eng = make_engine("cpu")
    eng.register("sales", sales_data)
    eng.register("customers", customers_data)
    eng.register("regions", {"region": np.array(["EU", "US", "APAC", "LATAM"]),
                             "mult": np.array([2, 3, 4, 5])})
    r = eng.query(
        "SELECT SUM(s.amount * g.mult) AS v FROM sales s "
        "JOIN customers c ON s.customer_id = c.customer_id "
        "JOIN regions g ON c.region = g.region"
    )
    sdf = pd.DataFrame(sales_data)
    cdf = pd.DataFrame(customers_data)
    gdf = pd.DataFrame({"region": ["EU", "US", "APAC", "LATAM"], "mult": [2, 3, 4, 5]})
    merged = sdf.merge(cdf, on="customer_id", suffixes=("_s", "_c"))
    exp = merged.merge(gdf, left_on="region_c", right_on="region")
    np.testing.assert_allclose(r.to_pydict()["v"][0], (exp.amount * exp.mult).sum())


def test_string_group_by(engine, sales_data):
    r = engine.query("SELECT region, COUNT(*) AS n FROM sales GROUP BY region")
    df = pd.DataFrame(sales_data)
    exp = df.groupby("region").size().reset_index(name="n")
    assert_result_equal(r, {c: exp[c].to_numpy() for c in exp.columns}, sort_by=["region"])


def test_string_filter(engine, sales_data):
    r = engine.query("SELECT COUNT(*) AS n FROM sales WHERE region = 'EU'")
    df = pd.DataFrame(sales_data)
    assert r.to_pydict()["n"][0] == (df.region == "EU").sum()


def test_order_by_limit(engine, sales_data):
    r = engine.query("SELECT amount FROM sales ORDER BY amount DESC LIMIT 10")
    df = pd.DataFrame(sales_data)
    exp = df.amount.sort_values(ascending=False).head(10).to_numpy()
    np.testing.assert_allclose(np.array(r.to_pydict()["amount"]), exp)


def test_order_by_multi_key(engine, sales_data):
    r = engine.query("SELECT region, year, amount FROM sales ORDER BY region ASC, year DESC, amount ASC LIMIT 50")
    df = pd.DataFrame(sales_data)
    exp = df.sort_values(["region", "year", "amount"],
                         ascending=[True, False, True]).head(50)
    got = r.to_pandas()
    assert list(got.region) == list(exp.region)
    assert list(got.year) == list(exp.year)
    np.testing.assert_allclose(got.amount.to_numpy(), exp.amount.to_numpy())


def test_limit_offset(engine):
    eng = make_engine("cpu")
    eng.register("t", {"a": np.arange(100)})
    r = eng.query("SELECT a FROM t ORDER BY a LIMIT 10 OFFSET 20")
    assert list(r.to_pydict()["a"]) == list(range(20, 30))


def test_distinct(engine):
    eng = make_engine("cpu")
    eng.register("t", {"a": np.array([1, 2, 1, 3, 2]), "b": np.array([1, 1, 1, 2, 1])})
    r = eng.query("SELECT DISTINCT a, b FROM t")
    df = r.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert df.values.tolist() == [[1, 1], [2, 1], [3, 2]]


def test_case_when(engine, sales_data):
    r = engine.query(
        "SELECT SUM(CASE WHEN amount > 100 THEN 1 ELSE 0 END) AS big FROM sales"
    )
    df = pd.DataFrame(sales_data)
    assert r.to_pydict()["big"][0] == (df.amount > 100).sum()


def test_in_between(engine, sales_data):
    r = engine.query(
        "SELECT COUNT(*) AS n FROM sales WHERE year IN (2021, 2023) "
        "AND quantity BETWEEN 10 AND 20"
    )
    df = pd.DataFrame(sales_data)
    exp = df[df.year.isin([2021, 2023]) & df.quantity.between(10, 20)]
    assert r.to_pydict()["n"][0] == len(exp)


def test_is_null_and_aggregate_null_skipping():
    eng = make_engine("cpu")
    eng.register("t", {"g": np.array([1, 1, 2, 2]),
                       "v": np.array([1.0, np.nan, 3.0, np.nan])})
    r = eng.query("SELECT g, COUNT(v) AS c, SUM(v) AS s, AVG(v) AS a FROM t GROUP BY g")
    d = r.to_pandas().sort_values("g")
    assert list(d.c) == [1, 1]
    np.testing.assert_allclose(list(d.s), [1.0, 3.0])
    r2 = eng.query("SELECT COUNT(*) AS n FROM t WHERE v IS NULL")
    assert r2.to_pydict()["n"][0] == 2


def test_date_part():
    eng = make_engine("cpu")
    ts = np.array(["2024-03-15T10:30:00", "2023-12-31T23:59:59"], dtype="datetime64[ms]")
    eng.register("t", {"ts": ts})
    r = eng.query(
        "SELECT date_part('year', ts) AS y, date_part('month', ts) AS m, "
        "date_part('day', ts) AS d, date_part('hour', ts) AS h FROM t"
    )
    d = r.to_pydict()
    assert list(d["y"]) == [2024, 2023]
    assert list(d["m"]) == [3, 12]
    assert list(d["d"]) == [15, 31]
    assert list(d["h"]) == [10, 23]


def test_like(engine, customers_data):
    r = engine.query("SELECT COUNT(*) AS n FROM customers WHERE customer_name LIKE 'cust00%'")
    # cust000..cust009
    assert r.to_pydict()["n"][0] == 10


def test_derived_table(engine, sales_data):
    r = engine.query(
        "SELECT t.region, SUM(t.v) AS s FROM "
        "(SELECT region, amount * quantity AS v FROM sales) t GROUP BY t.region"
    )
    df = pd.DataFrame(sales_data)
    df["v"] = df.amount * df.quantity
    exp = df.groupby("region").v.sum().reset_index(name="s")
    assert_result_equal(r, {c: exp[c].to_numpy() for c in exp.columns}, sort_by=["region"])


def test_self_join_via_derived(engine):
    eng = make_engine("cpu")
    eng.register("df", {"key": np.array([1, 2, 2, 3]),
                        "val": np.array([1.0, 2.0, 3.0, 4.0])})
    r = eng.query(
        "SELECT l.key, r.val FROM df l JOIN (SELECT * FROM df) r ON l.key = r.key"
    )
    # 1 + 4 + 1 = 6 matched pairs: key1x1, key2 2x2=4, key3 1x1
    assert r.num_rows == 6


def test_query_pandas_api(sales_data):
    eng = make_engine("cpu")
    df = pd.DataFrame({
        "category": ["A", "B", "A", "C"],
        "value": [1.0, -2.0, 3.0, 4.0],
        "quantity": [2, 3, 4, 5],
    })
    r = eng.query_pandas(df, """
        SELECT category, COUNT(*) AS count, SUM(value * quantity) AS total_value
        FROM df WHERE value > 0 GROUP BY category ORDER BY total_value DESC
    """)
    out = r.to_pandas()
    assert list(out.category) == ["C", "A"]
    np.testing.assert_allclose(out.total_value.to_numpy(), [20.0, 14.0])


def test_empty_result(engine):
    r = engine.query("SELECT amount FROM sales WHERE amount > 1e18")
    assert r.num_rows == 0
    r2 = engine.query("SELECT region, SUM(amount) AS s FROM sales WHERE amount > 1e18 GROUP BY region")
    assert r2.num_rows == 0


def test_global_agg_empty_input(engine):
    r = engine.query("SELECT COUNT(*) AS n, SUM(amount) AS s FROM sales WHERE amount > 1e18")
    d = r.to_pydict()
    assert r.num_rows == 1
    assert d["n"][0] == 0
    # SUM over empty is NULL
    assert np.isnan(d["s"][0])


def test_union_all_and_distinct():
    import numpy as np

    from gpu_olap_tpu import EngineConfig, OlapEngine

    eng = OlapEngine(EngineConfig(backend="cpu"))
    eng.register("a", {"k": np.array([1, 2, 3], dtype=np.int64),
                       "v": np.array([1.5, 2.5, 3.5])})
    eng.register("b", {"k": np.array([3, 4], dtype=np.int64),
                       "v": np.array([9, 9], dtype=np.int64)})
    r = eng.query("SELECT k, v FROM a UNION ALL SELECT k, v FROM b").to_pydict()
    assert sorted(r["k"].tolist()) == [1, 2, 3, 3, 4]
    # int column promoted to float alongside the float side
    assert 9.0 in r["v"].tolist()
    r2 = eng.query("SELECT k FROM a UNION SELECT k FROM b").to_pydict()
    assert sorted(r2["k"].tolist()) == [1, 2, 3, 4]


def test_union_schema_mismatch_errors():
    import numpy as np
    import pytest

    from gpu_olap_tpu import EngineConfig, OlapEngine
    from gpu_olap_tpu.plan.physical import PlanError

    eng = OlapEngine(EngineConfig(backend="cpu"))
    eng.register("a", {"k": np.array([1], dtype=np.int64)})
    eng.register("b", {"k": np.array([1], dtype=np.int64),
                       "v": np.array([1], dtype=np.int64)})
    with pytest.raises(PlanError):
        eng.query("SELECT k FROM a UNION ALL SELECT k, v FROM b")
