"""Plan-hygiene regression guard: no registry query may silently plan
a cartesian product or an unintended nested-loop join. The two exact
all-pairs baselines do so BY DESIGN (their docstrings say the LSH tier
replaces them at scale) and are whitelisted explicitly — anything else
that starts nested-looping is a scale bug this test catches at plan
time (no execution)."""

import pytest

from customer_churn_prediction_spark.plans import registry

# Deliberate O(n²) baselines / tiny-side nested loops, documented in
# their modules. Everything else must plan hash/sort-merge/broadcast
# HASH joins only. (dedup_ngram_jaccard was removed: it plans equi
# joins only, so whitelisting it silently disabled the guard there.)
ALLOWED_NESTED_LOOP = {
    "ann_bruteforce_topk",     # 5-query broadcast side, non-equi on ids
    "embedding_neardup_pairs",  # exact all-pairs baseline (LSH replaces)
    "text_tfidf_topk",          # 1-row broadcast scalar (corpus size)
}

_PLANNABLE = [
    n for n in registry.QUERIES
    if not n.startswith(("ml_", "multimodal_"))  # ML fits execute jobs to plan
]


@pytest.mark.parametrize("name", _PLANNABLE)
def test_no_accidental_cartesian_or_nested_loop(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian:\n{plan}"
    if name not in ALLOWED_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans an unexpected nested-loop join:\n{plan}"
        )
    else:
        # A whitelisted query that stops planning an NLJ is a stale
        # entry that would silently disable the guard — flag it.
        assert "BroadcastNestedLoopJoin" in plan, (
            f"{name} is whitelisted for NLJ but no longer plans one — "
            "remove it from ALLOWED_NESTED_LOOP"
        )
