"""Per-run materialization with a cluster-safe escape hatch (r15,
VERDICT r14 item 3/4).

The iterative operators (connected-components label propagation, BPE
merge rounds) truncate their per-round lineage with lazy
``localCheckpoint`` — the right local-mode default (no reliable
storage round-trip), but localCheckpoint blocks are UNREPLICATED
executor-local state: on a real cluster an executor loss kills the
job instead of recomputing lineage, and the loops checkpoint an
O(corpus) labels frame per round. ``SPARK_GRAFT_RELIABLE_CHECKPOINT``
(a writable directory, e.g. an HDFS/S3 path) routes exactly those
loop checkpoints to Spark's reliable checkpointing instead; local
default unchanged. SCALE.md §r15 documents the deployment rule.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_RELIABLE_CHECKPOINT"

# setCheckpointDir(path) creates a fresh UUID subdirectory per call, so
# it must run once per (context, configured path), not per checkpoint.
_DIR_SET_FOR: tuple[str, str] | None = None


def loop_checkpoint(df: DataFrame) -> DataFrame:
    """Lazy per-round materialization for iterative loops: lazy
    ``localCheckpoint`` by default, lazy RELIABLE ``checkpoint`` into
    $SPARK_GRAFT_RELIABLE_CHECKPOINT when set (read per call, so a
    test/deployment can flip it without rebuilding the session)."""
    global _DIR_SET_FOR, _MATERIALIZE_COUNT
    _MATERIALIZE_COUNT += 1
    reliable_dir = os.environ.get(_ENV)
    if not reliable_dir:
        return df.localCheckpoint(eager=False)
    sc = df.sparkSession.sparkContext
    key = (sc.applicationId, reliable_dir)
    if _DIR_SET_FOR != key:
        sc.setCheckpointDir(reliable_dir)
        _DIR_SET_FOR = key
    return df.checkpoint(eager=False)


# Count of per-run materializations performed since process start.
# plans/registry's plan memo snapshots this around a query build: a
# build that materialized ANY per-run intermediate must never be
# memoized (its plan hangs off per-run blocks — data, not a plan).
# Inspecting the plan string for LogicalRDD is NOT a substitute:
# driver-local model literals (createDataFrame of fitted centroids /
# LUTs / merge tables) are also LogicalRDDs but are deterministic
# per (app, sf_dir, mtime) through the sanctioned fit memos — the
# counter distinguishes the two where plan text cannot.
# tests/test_plan_memo.py pins the convention: query modules must
# call run_materialize()/loop_checkpoint(), never .localCheckpoint
# directly.
_MATERIALIZE_COUNT = 0


def materialize_count() -> int:
    return _MATERIALIZE_COUNT


def run_materialize(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint for a per-run multiply-consumed
    intermediate (the r14 guide-§3.3 pattern), counted so the plan
    memo can refuse to memoize any build that created one."""
    global _MATERIALIZE_COUNT
    _MATERIALIZE_COUNT += 1
    return df.localCheckpoint(eager=False)
