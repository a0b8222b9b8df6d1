"""The registered-query plan memo (r15): lazy plans only, never data.

Pins the three contracts that keep the memo an optimization rather
than result caching:

1. A memo hit is a LAZY plan — every execution re-reads the parquet
   sources in full (identical source-record counts across repeated
   executions of the same memoized frame).
2. Re-ingesting a table at the same path misses the memo (mtime key),
   the same refit contract the r14 relation memo pins.
3. Checkpoint-barrier queries (LogicalRDD in the analyzed plan — the
   dedup verify tails, iterative loops, rec-eval shared frames) are
   NEVER memoized: their plans hang off materialized per-run blocks,
   so reuse would serve cached data.
"""

from __future__ import annotations

import os
import shutil

from customer_churn_prediction_spark.plans import registry
from customer_churn_prediction_spark.plans.audit import run_with_metrics

from .conftest import SF_SMOKE


def test_memo_hit_recomputes_from_parquet(spark):
    queries = registry.get_queries()
    df1 = queries["rfm_groupby"](spark, SF_SMOKE)
    df2 = queries["rfm_groupby"](spark, SF_SMOKE)
    assert df2 is df1, "second build must be a memo hit"
    m1 = run_with_metrics(spark, lambda: df1, "memo-exec-1")
    m2 = run_with_metrics(spark, lambda: df2, "memo-exec-2")
    assert m1["input_records"] > 0
    assert m2["input_records"] == m1["input_records"], (
        "a memoized plan must re-read its sources in full on every "
        "execution — equal source-record counts"
    )


def test_memo_misses_on_reingest(spark, tmp_path):
    sf_copy = str(tmp_path / "sf_memo")
    os.makedirs(sf_copy)
    from customer_churn_prediction_spark.catalog import TABLES

    for t in TABLES:
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", f"{sf_copy}/{t}.parquet")
    queries = registry.get_queries()
    df1 = queries["rfm_groupby"](spark, sf_copy)
    shutil.copy(f"{SF_SMOKE}/orders.parquet", f"{sf_copy}/orders.parquet")
    os.utime(f"{sf_copy}/orders.parquet", (1, 1))
    df2 = queries["rfm_groupby"](spark, sf_copy)
    assert df2 is not df1, "re-ingested table must miss the memo"


def test_checkpoint_barrier_queries_are_not_memoized(spark):
    queries = registry.get_queries()
    a = queries["dedup_lsh_components"](spark, SF_SMOKE)
    b = queries["dedup_lsh_components"](spark, SF_SMOKE)
    assert b is not a, (
        "a LogicalRDD-bearing plan hangs off per-run checkpoint blocks "
        "and must be rebuilt from parquet on every call"
    )


def test_stored_forms_are_not_memoized(spark):
    queries = registry.get_queries()
    a = queries["ann_ivf_materialized"](spark, SF_SMOKE)
    b = queries["ann_ivf_materialized"](spark, SF_SMOKE)
    assert b is not a, (
        "ingest-backed constructors run the idempotent warehouse check "
        "per call by design"
    )


def test_model_literal_queries_are_memoized(spark):
    """createDataFrame model literals (fitted centroids/LUTs through
    the sanctioned fit memos) are LogicalRDDs in plan text but NOT
    per-run state — the counter-based exclusion must still memoize
    them (ann_recall_matrix was wrongly excluded by plan-text
    sniffing during r15 development)."""
    queries = registry.get_queries()
    a = queries["ann_recall_matrix"](spark, SF_SMOKE)
    b = queries["ann_recall_matrix"](spark, SF_SMOKE)
    assert b is a


def test_query_modules_never_call_localcheckpoint_directly():
    """The memo's safety rests on every per-run materialization being
    COUNTED: query modules must route through
    checkpointing.run_materialize / loop_checkpoint, never
    .localCheckpoint directly (a raw call would be invisible to the
    counter and its plan could be wrongly memoized)."""
    import glob
    import os

    root = os.path.join(
        os.path.dirname(__file__), "..", "customer_churn_prediction_spark"
    )
    offenders = []
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        rel = os.path.relpath(path, root)
        if rel == "checkpointing.py":
            continue
        src = open(path).read()
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#", 1)[0]
            if ".localCheckpoint(" in code:
                offenders.append(f"{rel}:{i}")
    assert not offenders, (
        "route these through checkpointing.run_materialize / "
        f"loop_checkpoint: {offenders}"
    )
