"""Simulate the driver's correctness pass: run every registry query at
sf0.01 with its DuckDB oracle, timing each, in registry order.

Usage: python scripts/driver_sim.py [--names q1,q2] [--sf-dir DIR]
Prints per-query wall seconds (spark collect + oracle) and a total, so we
can see whether the full 66-query registry fits a plausible driver time
budget and which queries dominate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default=None)
    args = ap.parse_args()

    import duckdb

    from customer_churn_prediction_spark.plans import get_oracles, get_queries
    from customer_churn_prediction_spark.session import get_spark

    spark = get_spark()
    queries = get_queries()
    oracles = get_oracles()

    names = args.names.split(",") if args.names else list(queries)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    timings: dict[str, dict] = {}
    total0 = time.perf_counter()
    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        err = None
        n_rows = None
        try:
            rows = fn(spark, args.sf_dir).collect()
            n_rows = len(rows)
        except Exception as exc:  # noqa: BLE001
            err = f"{type(exc).__name__}: {exc}"[:200]
        t_spark = time.perf_counter() - t0
        t1 = time.perf_counter()
        o_rows = None
        if name in oracles and err is None:
            try:
                o_rows = len(con.execute(oracles[name]).fetchall())
            except Exception as exc:  # noqa: BLE001
                err = f"oracle {type(exc).__name__}: {exc}"[:200]
        t_oracle = time.perf_counter() - t1
        timings[name] = {
            "spark_s": round(t_spark, 2),
            "oracle_s": round(t_oracle, 2),
            "rows": n_rows,
            "oracle_rows": o_rows,
            "err": err,
        }
        print(
            f"{name:32s} spark={t_spark:6.2f}s oracle={t_oracle:5.2f}s "
            f"rows={n_rows} orows={o_rows} {err or ''}",
            flush=True,
        )
    total = time.perf_counter() - total0
    print(json.dumps({"total_s": round(total, 1), "n": len(names)}))


if __name__ == "__main__":
    main()
