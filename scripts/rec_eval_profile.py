"""Attribute ``rec_eval_ndcg``'s scale growth to its phases.

VERDICT r9 item 5: the eval's decade curve (2.50 → 6.25 s across 100×
orders, SCALE §10) was attributed to "three chained phases" without
saying WHICH phase carries the scale term. This script times the
actual production sub-plans — ``operators/affinity._eval_frames``
exposes the exact frames the registered query consumes, so nothing
here can drift from what the driver hashes — cumulatively:

  split  = the leave-last-order-out window (train ∪ test order split)
  fit    = split + the pair-lift model on train baskets
  serve  = fit + recommendations from train ownership
  full   = the registered rec_eval_ndcg (adds truth/universe + grade)

Each tier is a fresh job (no caching), so tier N re-runs tier N-1's
work and the DELTA between consecutive medians is that phase's
marginal wall including its share of scan/shuffle — the number that
says where the scale term lives.

Usage: python scripts/rec_eval_profile.py [--iters N] [--sf-dirs D ...]
Prints one JSON object per sf plus a phase-delta summary.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default fixture ladder; overridable so the profile runs on any box
# layout (ADVICE r10 — sibling scripts accept the corpus dir).
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]


def main() -> None:
    global SFS
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--sf-dirs", nargs="+", default=SFS,
        help="parquet fixture dirs to profile, smallest first",
    )
    args = ap.parse_args()
    SFS = args.sf_dirs

    from customer_churn_prediction_spark.operators import affinity
    from customer_churn_prediction_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="rec-eval-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def tiers(sf_dir):
        fr = affinity._eval_frames(spark, sf_dir)
        return {
            "split": fr["train_orders"].unionByName(fr["test_orders"]),
            "fit": fr["pairs"],
            "serve": fr["recs"],
            "full": affinity.rec_eval_ndcg(spark, sf_dir),
        }

    # warm every plan once at the smallest sf (codegen compile cost
    # out of the measurement, the bench.py discipline)
    for df in tiers(SFS[0]).values():
        force(df)

    out = {}
    for sf_dir in SFS:
        walls = {}
        for name, df in tiers(sf_dir).items():
            samples = []
            for _ in range(args.iters):
                t0 = time.monotonic()
                force(df)
                samples.append(round(time.monotonic() - t0, 3))
            walls[name] = round(statistics.median(samples), 3)
        order = ["split", "fit", "serve", "full"]
        deltas = {
            "split": walls["split"],
            **{
                b: round(walls[b] - walls[a], 3)
                for a, b in zip(order, order[1:])
            },
        }
        out[sf_dir.rsplit("sf", 1)[-1]] = {
            "cumulative": walls, "delta": deltas,
        }
        print(json.dumps({"sf": sf_dir, "cumulative": walls,
                          "delta": deltas}))

    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
