"""Scan-hygiene regression guard: every registered query's parquet
scans must stay as narrow as the golden profile
(`scan_profiles.json`, regenerated deliberately via
`scripts/gen_plan_goldens.py`), and a filter that reached the parquet
reader must not silently stop being pushed.

This enforces, repo-wide and at plan time, the two properties a 100 TB
scan lives or dies by: column pruning (a scan that starts reading all
16 lineitem columns for a 3-column aggregate is a 5× I/O regression
before a single operator runs) and predicate pushdown (a filter that
falls off the reader turns a partition-pruned read into a full-table
scan). The shuffle-budget twin (`test_shuffle_budget.py`) covers the
post-scan stages; together they pin the whole plan shape.
"""

import json
import os

import pytest

from customer_churn_prediction_spark.plans import registry
from customer_churn_prediction_spark.plans.audit import scan_profiles

from .conftest import SF_SMOKE

_GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "scan_profiles.json"))
)

_default_smoke = SF_SMOKE == "/root/testdata/sf0.001"


def test_every_query_has_a_scan_profile():
    plannable = {
        n
        for n in {**registry.QUERIES, **registry.get_staged_queries()}
        if not n.startswith(("ml_", "multimodal_"))
    }
    assert set(_GOLDEN) == plannable, (
        f"stale: {sorted(set(_GOLDEN) - plannable)}, "
        f"unguarded: {sorted(plannable - set(_GOLDEN))} — "
        "regenerate with scripts/gen_plan_goldens.py"
    )


@pytest.mark.skipif(
    not _default_smoke,
    reason="profiles generated at the default sf0.001 fixtures",
)
@pytest.mark.parametrize("name", sorted(_GOLDEN))
def test_scans_stay_pruned_and_pushed(spark, sf_dir, name):
    surface = {**registry.QUERIES, **registry.get_staged_queries()}
    actual = scan_profiles(surface[name](spark, sf_dir), sf_dir)
    golden = _GOLDEN[name]
    for table, prof in actual.items():
        assert table in golden, (
            f"{name} now scans {table}, which the golden has no profile "
            "for — regenerate tests/scan_profiles.json deliberately "
            "(scripts/gen_plan_goldens.py)"
        )
        assert prof["cols"] <= golden[table]["cols"], (
            f"{name} reads {prof['cols']} columns of {table}, golden "
            f"{golden[table]['cols']} — column pruning regressed"
        )
        if golden[table]["pushed"]:
            assert prof["pushed"], (
                f"{name}: filters no longer reach the {table} parquet "
                "reader — predicate pushdown regressed"
            )
