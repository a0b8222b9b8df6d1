"""Per-query driver-side build cost vs execution cost (r15, guide §1).

For every bench query: t_build = wall time of the Python constructor
``fn(spark, sf_dir)`` (py4j chatter, eager fits, literal construction,
memo lookups); t_exec = wall time of the noop-sink write of the built
frame. Medians over N alternating passes. Directs VERDICT r14 item 6
(the sub-second tier is planning/py4j-bound — find out where).

Usage: python scripts/build_vs_exec.py [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SPARK_GRAFT_BVE_ITERS", "5"))


def main() -> None:
    from customer_churn_prediction_spark.plans import get_queries
    from customer_churn_prediction_spark.session import get_spark

    spark = get_spark(app_name="ccp-build-vs-exec", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    names = sys.argv[1:]
    if not names:
        import bench

        names = bench.BENCH_QUERIES

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm at smallest sf
    for name in names:
        force(queries[name](spark, "/root/testdata/sf0.001"))

    rows = []
    for name in names:
        tb, te = [], []
        for _ in range(N):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            tb.append(t1 - t0)
            te.append(t2 - t1)
        rows.append((name, statistics.median(tb), statistics.median(te)))
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':32s} {'build_s':>8s} {'exec_s':>8s} {'build%':>7s}")
    for name, b, e in rows:
        print(f"{name:32s} {b:8.3f} {e:8.3f} {100*b/(b+e):6.1f}%")
    print(f"TOTAL build {sum(r[1] for r in rows):.2f}s  "
          f"exec {sum(r[2] for r in rows):.2f}s")


if __name__ == "__main__":
    main()
