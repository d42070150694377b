"""gpu_olap_tpu — Python usage examples.

Mirrors the reference's documented Python API surface
(``examples/python_usage.py`` in the reference repo): engine construction with
memory/stream kwargs, Parquet loading, SQL queries, pandas/polars integration,
and a join micro-benchmark — all running for real here.
"""

import time

import numpy as np
import pandas as pd

import gpu_olap_tpu as got

# demo scale: full size on an accelerator, small on host CPU (XLA CPU sorts
# of 1M-row tables make a sluggish demo)
def _demo_rows(full: int) -> int:
    try:
        import jax

        if jax.devices()[0].platform != "cpu":
            return full
    except Exception:
        pass
    return max(full // 20, 10_000)


def example_basic_queries(tmpdir="/tmp/gpu_olap_tpu_demo"):
    """Basic SQL query examples (reference python_usage.py:15-69)."""
    print("=== Basic Queries ===\n")
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(tmpdir, exist_ok=True)
    rng = np.random.default_rng(0)
    n = _demo_rows(1_000_000)
    pq.write_table(pa.table({
        "product_id": rng.integers(0, 1000, n),
        "amount": np.abs(rng.normal(500, 400, n)),
        "customer_id": rng.integers(0, 10_000, n),
        "region": rng.choice(["EU", "US", "APAC"], n),
        "year": rng.integers(2020, 2026, n),
    }), f"{tmpdir}/sales.parquet")
    pq.write_table(pa.table({
        "customer_id": np.arange(10_000),
        "customer_name": [f"cust{i}" for i in range(10_000)],
        "region": rng.choice(["EU", "US", "APAC"], 10_000),
    }), f"{tmpdir}/customers.parquet")

    # reference-compatible constructor kwargs
    engine = got.GpuOlapEngine(
        max_gpu_memory=8 * 1024**3,
        num_streams=8,
        use_unified_memory=True,
    )
    engine.load_table("sales", f"{tmpdir}/sales.parquet")
    engine.load_table("customers", f"{tmpdir}/customers.parquet")

    print("1. Simple SELECT with WHERE:")
    result = engine.query("""
        SELECT product_id, amount, customer_id
        FROM sales
        WHERE amount > 1000
        LIMIT 10
    """)
    print(result.to_pandas())

    print("\n2. GROUP BY aggregation:")
    result = engine.query("""
        SELECT
            region,
            COUNT(*) as num_sales,
            SUM(amount) as total_amount,
            AVG(amount) as avg_amount
        FROM sales
        GROUP BY region
        ORDER BY total_amount DESC
    """)
    print(result.to_pandas())

    print("\n3. JOIN with customers:")
    result = engine.query("""
        SELECT
            c.region,
            SUM(s.amount) as total_purchases,
            COUNT(*) as num_purchases
        FROM sales s
        JOIN customers c ON s.customer_id = c.customer_id
        WHERE s.year = 2024
        GROUP BY c.region
        ORDER BY total_purchases DESC
        LIMIT 20
    """)
    print(result.to_pandas())


def example_pandas_integration():
    """Pandas DataFrame integration (reference python_usage.py:72-135)."""
    print("\n=== Pandas Integration ===\n")
    engine = got.GpuOlapEngine()

    df = pd.DataFrame({
        "id": range(_demo_rows(1_000_000)),
        "category": np.random.choice(["A", "B", "C", "D"], _demo_rows(1_000_000)),
        "value": np.random.randn(_demo_rows(1_000_000)) * 100,
        "quantity": np.random.randint(1, 100, _demo_rows(1_000_000)),
    })

    start = time.time()
    result = engine.query_pandas(df, """
        SELECT
            category,
            COUNT(*) as count,
            SUM(value * quantity) as total_value,
            AVG(value) as avg_value,
            MAX(quantity) as max_quantity
        FROM df
        WHERE value > 0
        GROUP BY category
        ORDER BY total_value DESC
    """)
    elapsed = time.time() - start
    print(result.to_pandas())
    print(f"\nQuery time: {elapsed*1000:.2f}ms (backend: {result.metrics['backend']})")


def example_polars_integration():
    """Polars via Arrow (reference python_usage.py:138-208); gated on import."""
    try:
        import polars as pl
    except ImportError:
        print("\n=== Polars not installed; skipping ===")
        return
    print("\n=== Polars Integration ===\n")
    engine = got.GpuOlapEngine()
    df = pl.DataFrame({
        "sensor_id": np.random.randint(1, 100, 8760),
        "temperature": np.random.randn(8760) * 10 + 20,
        "humidity": np.random.randn(8760) * 15 + 60,
    })
    result = engine.query_polars(df, """
        SELECT sensor_id, COUNT(*) as readings,
               AVG(temperature) as avg_temp,
               MAX(temperature) - MIN(temperature) as temp_range
        FROM df GROUP BY sensor_id
        HAVING avg_temp > 20 ORDER BY temp_range DESC LIMIT 10
    """)
    print(pl.from_arrow(result.to_arrow()))


def example_complex_analytics():
    """HAVING / COUNT(DISTINCT) / multi-join (reference python_usage.py:211-258)."""
    print("\n=== Complex Analytics ===\n")
    engine = got.GpuOlapEngine()
    rng = np.random.default_rng(1)
    n_orders, n_items, n_products, n_customers = 200_000, 600_000, 1000, 5000
    engine.register("orders", {
        "order_id": np.arange(n_orders),
        "customer_id": rng.integers(0, n_customers, n_orders),
        "status": rng.choice(["completed", "pending", "cancelled"], n_orders,
                             p=[0.8, 0.15, 0.05]),
    })
    engine.register("order_items", {
        "order_id": rng.integers(0, n_orders, n_items),
        "product_id": rng.integers(0, n_products, n_items),
        "quantity": rng.integers(1, 10, n_items),
    })
    engine.register("products", {
        "product_id": np.arange(n_products),
        "category": rng.choice(["tools", "toys", "food", "books"], n_products),
        "price": np.round(np.abs(rng.normal(30, 20, n_products)), 2),
    })
    engine.register("customers", {
        "customer_id": np.arange(n_customers),
        "region": rng.choice(["EU", "US", "APAC"], n_customers),
    })

    query = """
    SELECT
        c.region,
        p.category,
        COUNT(DISTINCT o.order_id) as num_orders,
        SUM(oi.quantity * p.price) as total_revenue,
        AVG(oi.quantity * p.price) as avg_order_value
    FROM orders o
    JOIN order_items oi ON o.order_id = oi.order_id
    JOIN products p ON oi.product_id = p.product_id
    JOIN customers c ON o.customer_id = c.customer_id
    WHERE o.status = 'completed'
    GROUP BY c.region, p.category
    HAVING total_revenue > 100000
    ORDER BY total_revenue DESC
    """
    start = time.time()
    result = engine.query(query)
    elapsed = time.time() - start
    print(result.to_pandas())
    print(f"\nQuery processed in {elapsed:.2f}s; rows: {result.num_rows}")


def benchmark_join_performance():
    """Join scaling micro-benchmark (reference python_usage.py:289-327)."""
    print("\n=== Join Performance Benchmark ===\n")
    engine = got.GpuOlapEngine()
    for size in [10_000, 100_000, _demo_rows(1_000_000)]:
        rng = np.random.default_rng(size)
        left = pd.DataFrame({
            "key": rng.integers(0, size // 2, size),
            "left_value": rng.standard_normal(size),
        })
        right = pd.DataFrame({
            "key": rng.integers(0, size // 2, size),
            "right_value": rng.standard_normal(size),
        })
        engine.register("lhs", left)
        engine.register("rhs", right)
        engine.query("SELECT COUNT(*) AS n FROM lhs JOIN rhs ON lhs.key = rhs.key")  # warm
        start = time.time()
        engine.query("SELECT COUNT(*) AS n FROM lhs JOIN rhs ON lhs.key = rhs.key")
        t_engine = time.time() - start
        start = time.time()
        _ = left.merge(right, on="key")
        t_pandas = time.time() - start
        print(f"  {size:>9,} rows: engine {t_engine*1000:8.2f}ms  "
              f"pandas {t_pandas*1000:8.2f}ms  speedup {t_pandas/t_engine:5.2f}x")


if __name__ == "__main__":
    print("gpu_olap_tpu — Python Examples")
    print("=" * 60)
    for fn in [example_basic_queries, example_pandas_integration,
               example_polars_integration, example_complex_analytics,
               benchmark_join_performance]:
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — demo robustness
            print(f"Error in {fn.__name__}: {e}")
    print("\n" + "=" * 60)
    print("Examples completed!")
