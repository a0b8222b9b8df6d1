"""Shuffle-budget regression guard: every registered query's plan must
not shuffle MORE than its golden budget (`shuffle_budgets.json`,
regenerated deliberately via `scripts/gen_plan_goldens.py`).

The budget is the static plan's shuffle-Exchange count outside cache
barriers (`plans/audit.py`) — a deterministic upper bound on the
runtime shuffles. An edit that sneaks an extra Exchange into a
registered plan (a lost broadcast, an unpushed aggregation, a join
that stopped co-locating) fails HERE, at plan time on the smoke
fixtures, instead of surfacing as a wall-clock regression at scale.

Plan shapes (broadcast-vs-SMJ choices, spread repartitions) are a
function of the fixture sizes, so the golden only binds at the default
smoke dir the budgets were generated against; a relocated-fixture run
skips rather than asserting someone else's plan shapes.
"""

import json
import os

import pytest

from customer_churn_prediction_spark.plans import registry
from customer_churn_prediction_spark.plans.audit import (
    count_shuffle_exchanges,
)

from .conftest import SF_SMOKE

_BUDGETS = json.load(
    open(os.path.join(os.path.dirname(__file__), "shuffle_budgets.json"))
)

_default_smoke = SF_SMOKE == "/root/testdata/sf0.001"


def test_every_budgeted_query_is_registered():
    """A budget row whose query left the registry is dead weight that
    would silently shrink the guard — and a registered plannable query
    with no budget row is unguarded."""
    plannable = {
        n
        for n in {**registry.QUERIES, **registry.get_staged_queries()}
        if not n.startswith(("ml_", "multimodal_"))
    }
    assert set(_BUDGETS) == plannable, (
        f"stale: {sorted(set(_BUDGETS) - plannable)}, "
        f"unguarded: {sorted(plannable - set(_BUDGETS))} — "
        "regenerate with scripts/gen_plan_goldens.py"
    )


@pytest.mark.skipif(
    not _default_smoke,
    reason="budgets generated at the default sf0.001 fixtures",
)
@pytest.mark.parametrize("name", sorted(_BUDGETS))
def test_shuffle_count_within_budget(spark, sf_dir, name):
    surface = {**registry.QUERIES, **registry.get_staged_queries()}
    df = surface[name](spark, sf_dir)
    n = count_shuffle_exchanges(df)
    assert n <= _BUDGETS[name], (
        f"{name} plans {n} shuffle Exchanges, budget {_BUDGETS[name]} — "
        "either restore the cheaper plan or accept the regression "
        "deliberately by regenerating tests/shuffle_budgets.json "
        "(scripts/gen_plan_goldens.py)"
    )
