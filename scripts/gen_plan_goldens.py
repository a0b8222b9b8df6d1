"""Regenerate the golden plan-hygiene files.

Plans every registered query at the default smoke fixtures
(`/root/testdata/sf0.001` — the dir the guard tests enforce at) and
records, per query:

- its runtime shuffle-Exchange count (`plans/audit.
  count_shuffle_exchanges`, cache-barrier-aware) into
  `tests/shuffle_budgets.json` (guard: `tests/test_shuffle_budget.py`);
- its source-table scan profile — widest column set read and whether
  filters reached the parquet reader (`plans/audit.scan_profiles`) —
  into `tests/scan_profiles.json` (guard: `tests/test_scan_hygiene.py`).

Run this ONLY when a plan change is deliberate: the guards hold every
query to `shuffles <= budget`, `scan cols <= golden`, and `pushed
filters don't disappear`, so improving a plan keeps passing
(regenerate to ratchet the golden down), while an edit that widens a
scan, drops a pushdown, or adds a shuffle fails until the plan is
fixed or the regression is accepted here on purpose.

Usage: python scripts/gen_plan_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"
BUDGETS_OUT = os.path.join(REPO, "tests", "shuffle_budgets.json")
SCANS_OUT = os.path.join(REPO, "tests", "scan_profiles.json")


def main() -> None:
    from customer_churn_prediction_spark.plans import registry
    from customer_churn_prediction_spark.plans.audit import (
        count_shuffle_exchanges,
        scan_profiles,
    )
    from customer_churn_prediction_spark.session import get_spark

    spark = get_spark(
        app_name="gen-plan-goldens",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    budgets = {}
    scans = {}
    surface = dict(registry.QUERIES)
    surface.update(registry.get_staged_queries())  # pytest-only tier too
    for name, fn in surface.items():
        # ML fits and the multimodal Arrow path execute whole jobs at
        # plan-construction time; their cost is not plan-shaped the
        # same way and they are excluded (as in test_plan_hygiene).
        if name.startswith(("ml_", "multimodal_")):
            continue
        df = fn(spark, SF_DIR)
        budgets[name] = count_shuffle_exchanges(df)
        scans[name] = scan_profiles(df, SF_DIR)
    for out, data in ((BUDGETS_OUT, budgets), (SCANS_OUT, scans)):
        with open(out, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(data)} entries to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
