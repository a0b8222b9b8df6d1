"""Measure WHERE the KMV intersection estimate degrades vs exact.

VERDICT r9 item 5: ``segment_overlap_kmv`` documents its intersection
error band as ±3·U/√K ABSOLUTE in the union size U — honest about the
small-intersection weakness, but undemonstrated. This script pins it
with numbers: two synthetic month-buyer sets of fixed size N with a
CONTROLLED intersection I (month A = keys [0, N), month B = keys
[N-I, 2N-I) — |A|=|B|=N, |A∩B|=I exactly), swept from I ≈ U/2 down
to I = 0, run through the engine's own ``kmv_sketch`` +
``kmv_pair_estimates`` (operators/sketches.py — the same plan the
registered query and the maintained KMV store serve).

The claim under test: the estimate's ABSOLUTE error stays inside
3·U/√K regardless of I, which means the RELATIVE error explodes once
I << U/√K — at K=128 the noise floor is ≈ 0.265·U, so an
intersection below a quarter of the union is indistinguishable from
rho=0 and the report's ``retained_in_band`` verdict (banded in U, not
in I) is the honest contract. Output: one row per I with exact vs
estimate, absolute error as a fraction of U, and the band verdict.

Usage: python scripts/kmv_error_band.py [--n 100000]
Prints one JSON line per sweep point.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from customer_churn_prediction_spark.operators import sketches
    from customer_churn_prediction_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="kmv-error-band",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = args.n
    k = sketches.KMV_K
    band = sketches._KMV_INTER_BAND
    for i in [n // 2, n // 5, n // 20, n // 200, n // 2000, 0]:
        a = spark.range(n).select(
            F.lit(datetime.date(2024, 1, 1)).alias("grp"),
            F.col("id").cast("string").alias("key"),
        )
        b = spark.range(n).select(
            F.lit(datetime.date(2024, 2, 1)).alias("grp"),
            (F.col("id") + (n - i)).cast("string").alias("key"),
        )
        buyers = a.unionByName(b)
        est = sketches.kmv_pair_estimates(
            sketches.kmv_sketch(buyers)
        ).collect()
        assert len(est) == 1, est
        row = est[0]
        u = 2 * n - i
        abs_err = abs(row["_est_int"] - i)
        print(json.dumps({
            "K": k, "n_per_month": n,
            "exact_union": u, "exact_int": i,
            "int_over_union": round(i / u, 4),
            "est_union": round(row["_est_union"], 1),
            "est_int": round(row["_est_int"], 1),
            "abs_err_over_union": round(abs_err / u, 4),
            "band_3U_sqrtK": round(band, 4),
            "in_band": bool(abs_err <= band * u),
        }))


if __name__ == "__main__":
    main()
