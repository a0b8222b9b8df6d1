"""Regenerate the golden per-query shuffle budgets.

Plans every registered query at the default smoke fixtures
(`/root/testdata/sf0.001` — the dir `tests/test_shuffle_budget.py`
enforces at) and records each plan's runtime shuffle-Exchange count
(`plans/audit.count_shuffle_exchanges` — cache-barrier-aware, see that
module) into `tests/shuffle_budgets.json`.

Run this ONLY when a plan change is deliberate: the test holds every
query to `count <= budget`, so lowering a plan's shuffle count keeps
passing (regenerate to ratchet the budget down), while an edit that
adds a shuffle fails until either the plan is fixed or the regression
is accepted here on purpose.

Usage: python scripts/gen_shuffle_budgets.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(REPO, "tests", "shuffle_budgets.json")


def main() -> None:
    from customer_churn_prediction_spark.plans import registry
    from customer_churn_prediction_spark.plans.audit import (
        count_shuffle_exchanges,
    )
    from customer_churn_prediction_spark.session import get_spark

    spark = get_spark(
        app_name="gen-shuffle-budgets",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    budgets = {}
    for name in registry.QUERIES:
        # ML fits and the multimodal Arrow path execute whole jobs at
        # plan-construction time; their cost is not plan-shaped the
        # same way and they are excluded from the budget (as in
        # test_plan_hygiene).
        if name.startswith(("ml_", "multimodal_")):
            continue
        df = registry.QUERIES[name](spark, SF_DIR)
        budgets[name] = count_shuffle_exchanges(df)
    with open(OUT, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(budgets)} budgets to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
