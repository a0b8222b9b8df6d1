"""Solo micro-bench of named queries: consecutive-triple medians via
the noop sink (the bench's steady-state methodology), for quick A/B of
a single query during optimization work.

Usage: python scripts/microbench.py q1 [q2 ...] [--iters N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from customer_churn_prediction_spark.plans import get_queries
    from customer_churn_prediction_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 5
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
    spark = get_spark(app_name="ccp-microbench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm every named plan once at the smallest sf (codegen compile)
    for name in args:
        force(queries[name](spark, "/root/testdata/sf0.001"))
    for name in args:
        spark.sparkContext.setJobDescription(f"microbench: {name}")
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            force(queries[name](spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: median={statistics.median(samples):.3f}s "
            f"min={min(samples):.3f} max={max(samples):.3f} "
            f"samples={[round(s, 3) for s in samples]}"
        )


if __name__ == "__main__":
    main()
