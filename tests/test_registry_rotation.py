"""Rotation-staleness invariant (VERDICT r03 item 1).

The driver checks only the first ~50 registry entries per round, so
with >50 registered queries the PRIORITY list is load-bearing: any
entry it fails to front-load keeps whatever driver evidence it already
has.  This test simulates the next driver round against the committed
CORRECTNESS_r*.json history and asserts that afterwards every entry's
most recent green row is at most one round old — i.e. an entry may
only be rotated out of the budget if it was green in the latest round.
"""

import glob
import json
import os
import re

from customer_churn_prediction_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Observed driver budget: every CORRECTNESS_r*.json so far has exactly
# 50 rows.  If the driver's budget shrinks this constant must follow.
DRIVER_BUDGET = 50


def _history():
    rounds = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def _is_green(row):
    if row.get("hash_match"):
        return True
    # rows-only contract: driver records err="no_oracle" plus a count.
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def test_driver_budget_assumption_holds():
    for rnd, rows in _history().items():
        assert len(rows) <= DRIVER_BUDGET, (rnd, len(rows))


def test_no_entry_goes_two_rounds_stale():
    rounds = _history()
    assert rounds, "driver correctness history missing"
    latest = max(rounds)
    checked_next = set(list(registry.get_queries())[:DRIVER_BUDGET])
    stale = []
    for name in registry.get_queries():
        if name in checked_next:
            continue  # re-proven next round by construction
        row = rounds[latest].get(name)
        if row is None or not _is_green(row):
            last_green = max(
                (r for r, rows in rounds.items()
                 if name in rows and _is_green(rows[name])),
                default=None,
            )
            stale.append((name, last_green))
    assert not stale, (
        f"entries outside the next {DRIVER_BUDGET}-entry driver budget "
        f"whose latest driver row is not green in round {latest}: {stale}"
    )


def test_priority_names_all_resolve():
    names = set(registry.get_queries())
    missing = [n for n in registry.PRIORITY if n not in names]
    assert not missing, f"PRIORITY names with no registered query: {missing}"
