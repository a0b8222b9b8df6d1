"""Unit tests for the plan-string parsers behind the plan-hygiene
goldens (`plans/audit.py`) — synthetic plan fragments, no Spark
session, so the parsing contract is pinned independently of what the
current Spark version happens to print."""

from __future__ import annotations

from customer_churn_prediction_spark.plans.audit import (
    count_shuffles_in_plan_string,
    scan_profiles,
)


def test_counts_all_shuffle_kinds_but_not_broadcast():
    plan = "\n".join([
        "AdaptiveSparkPlan isFinalPlan=false",
        "+- Exchange hashpartitioning(k#1L, 32), ENSURE_REQUIREMENTS",
        "   +- Exchange rangepartitioning(k#1L ASC, 32)",
        "      +- Exchange SinglePartition",
        "         +- Exchange RoundRobinPartitioning(32)",
        "            +- BroadcastExchange HashedRelationBroadcastMode",
        "               +- ReusedExchange [k#1L]",
        "                  +- Scan parquet",
    ])
    assert count_shuffles_in_plan_string(plan) == 4


def test_skips_exchanges_inside_cached_subtrees():
    plan = "\n".join([
        "Union",
        ":- Project [a#1]",
        ":  +- InMemoryTableScan [a#1]",
        ":        +- InMemoryRelation [a#1], StorageLevel(disk, memory)",
        ":              +- AdaptiveSparkPlan isFinalPlan=true",
        ":                 +- Exchange hashpartitioning(a#1, 8)",
        ":                    +- Exchange hashpartitioning(b#2, 8)",
        "+- Exchange hashpartitioning(c#3, 8)",
        "   +- Scan parquet",
    ])
    # the two exchanges under InMemoryRelation are recompute fallback,
    # not work the query performs; the sibling at lower depth counts
    assert count_shuffles_in_plan_string(plan) == 1


def test_nested_cached_subtrees_end_where_depth_returns():
    plan = "\n".join([
        "+- InMemoryRelation [a#1]",
        "      +- Exchange hashpartitioning(a#1, 8)",
        "+- Exchange hashpartitioning(b#2, 8)",
    ])
    assert count_shuffles_in_plan_string(plan) == 1


class _FakeDF:
    """Duck-typed stand-in exposing the one attribute chain
    scan_profiles reads."""

    def __init__(self, plan: str):
        self._plan = plan

        class _QE:
            def __init__(self, p):
                self._p = p

            def executedPlan(self):
                outer = self

                class _EP:
                    def toString(self):
                        return outer._p

                return _EP()

        class _JDF:
            def __init__(self, p):
                self._qe = _QE(p)

            def queryExecution(self):
                return self._qe

        self._jdf = _JDF(plan)


def test_scan_profiles_widest_scan_and_pushdown_or():
    plan = "\n".join([
        "+- FileScan parquet [o_orderkey#0L,o_custkey#1L] Batched: true,"
        " DataFilters: [], Format: Parquet, Location: InMemoryFileIndex"
        "(1 paths)[file:/data/sf/orders.parquet], PartitionFilters: [],"
        " PushedFilters: [], ReadSchema: struct<...>",
        "+- FileScan parquet [o_orderkey#9L,o_custkey#10L,o_total#11]"
        " Batched: true, DataFilters: [isnotnull(o_orderkey#9L)],"
        " Format: Parquet, Location: InMemoryFileIndex(1 paths)"
        "[file:/data/sf/orders.parquet], PartitionFilters: [],"
        " PushedFilters: [IsNotNull(o_orderkey)], ReadSchema: struct<>",
        "+- FileScan parquet [x#5] Batched: true, DataFilters: [],"
        " Format: Parquet, Location: InMemoryFileIndex(1 paths)"
        "[file:/elsewhere/other.parquet], PushedFilters: [],"
        " ReadSchema: struct<x:int>",
    ])
    prof = scan_profiles(_FakeDF(plan), "/data/sf")
    assert prof == {"orders": {"cols": 3, "pushed": True}}


def test_scan_profiles_ignores_non_matching_roots():
    plan = (
        "+- FileScan parquet [a#1] Batched: true, Location: "
        "InMemoryFileIndex(1 paths)[file:/warehouse/store_tbl], "
        "PushedFilters: [IsNotNull(a)], ReadSchema: struct<a:int>"
    )
    assert scan_profiles(_FakeDF(plan), "/data/sf") == {}
