"""Capture .explain('formatted') for registered queries → plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Round dir from $SPARK_GRAFT_PLANS_ROUND (default r15).
Writes plans/<round>/<query>_<suffix>.txt for each named query (default:
every bench query). Planning only — but note some query constructors
run fit jobs (kmeans/PQ/DSIR band) while BUILDING the DataFrame, so
this is not free; run it solo.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> None:
    from customer_churn_prediction_spark.plans import get_queries
    from customer_churn_prediction_spark.session import get_spark

    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.BENCH_QUERIES
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="ccp-plan-capture", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = get_queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
