"""Command-line SQL runner — the application-layer analogue of the
reference's ``examples/rust_usage.rs`` driver (engine construction, table
loading, query execution, error surfacing, timing).

Usage:
    python -m gpu_olap_tpu --table sales=data/sales.parquet \
        "SELECT region, SUM(amount) FROM sales GROUP BY region"
    python -m gpu_olap_tpu --table t=data.parquet          # REPL
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="gpu_olap_tpu")
    ap.add_argument("sql", nargs="?", help="SQL to run (omit for a REPL)")
    ap.add_argument("--table", action="append", default=[],
                    metavar="NAME=PATH", help="load a Parquet table")
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "device", "cpu"])
    ap.add_argument("--explain", action="store_true",
                    help="print plans instead of executing")
    ap.add_argument("--mesh", type=int, default=None,
                    help="distributed mesh size (devices)")
    ap.add_argument("--max-rows", type=int, default=50,
                    help="max rows to print")
    args = ap.parse_args(argv)

    from . import EngineConfig, OlapEngine

    cfg = EngineConfig(backend=args.backend)
    if args.mesh:
        cfg.mesh_shape = (args.mesh,)
    engine = OlapEngine(cfg)

    for spec in args.table:
        if "=" not in spec:
            print(f"--table expects NAME=PATH, got {spec!r}", file=sys.stderr)
            return 2
        name, path = spec.split("=", 1)
        try:
            engine.load_table(name, path)
        except Exception as e:  # noqa: BLE001 — CLI error surface
            print(f"error loading {name!r} from {path}: {e}", file=sys.stderr)
            return 2

    def run_one(sql: str) -> None:
        sql = sql.strip()
        if not sql:
            return
        if args.explain:
            print(engine.explain(sql))
            return
        t0 = time.perf_counter()
        try:
            result = engine.query(sql)
        except Exception as e:  # noqa: BLE001 — graceful SQL error surfacing
            print(f"error: {e}", file=sys.stderr)
            return
        dt = time.perf_counter() - t0
        df = result.to_pandas()
        with_trunc = len(df) > args.max_rows
        print(df.head(args.max_rows).to_string())
        if with_trunc:
            print(f"... ({len(df)} rows total)")
        print(f"-- {result.num_rows} rows in {dt*1e3:.1f} ms "
              f"[{result.metrics.get('backend')}]", file=sys.stderr)

    if args.sql:
        run_one(args.sql)
        return 0

    # REPL
    print(f"gpu_olap_tpu SQL shell — tables: {engine.catalog.list_tables()}")
    print("end statements with ';', \\q to quit")
    buf: list = []
    while True:
        try:
            prompt = "sql> " if not buf else "...> "
            line = input(prompt)
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if line.strip() in ("\\q", "exit", "quit"):
            return 0
        buf.append(line)
        if line.rstrip().endswith(";"):
            run_one(" ".join(buf).rstrip(";"))
            buf = []


if __name__ == "__main__":
    raise SystemExit(main())
