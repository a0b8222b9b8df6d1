"""Runtime-metrics guard for barrier-bearing queries (r15, VERDICT r14
item 2).

The r14 localCheckpoint barriers made parts of several final plans
invisible to .explain() text — the scan-hygiene golden for
dedup_lsh_components records pushed:false and rec_eval_ndcg left the
NLJ whitelist — so a pushdown / semi-join-prune / join-explosion
regression BELOW a barrier can no longer fail a plan-text guard. This
guard asserts the totals such a regression cannot hide from: records
read from sources and shuffle bytes written, per query, against the
committed budgets in runtime_budgets.json (regenerated deliberately
via scripts/gen_runtime_budgets.py, same discipline as the shuffle
budgets).

Signals and the regression class each catches (red-tested during r15
development — OPTIMIZATION_r15.md has the experiments):
  shuffle bytes — a lost broadcast / lost semi-join prune / exploding
                  join upstream of an exchange. VERIFIED RED: forcing
                  the part-dimension join below rec_eval_ndcg's
                  checkpoint barrier to shuffle moved the total
                  1,638,772 -> 2,245,819 bytes (+37%, past slack).
  input_records — scan multiplicity (an extra source pass whose
                  exchange cannot be reused).
  input_bytes   — recorded for trend context only; at this fixture the
                  metric is file-granular (single small files), so
                  column-pruning regressions do NOT move it — and AQE's
                  ReusedExchange absorbs plain duplicate-lineage breaks
                  here too. Those classes bind only at scale; the two
                  signals above are the ones that move at the fixture.

Budgets bind only under the shape they were generated against
(local[8], shuffle_partitions=8, the default sf0.01 fixture): a
relocated-fixture run skips rather than asserting someone else's
volumes. Slack: records are deterministic at fixed SF (x1.2 for
engine-version drift); shuffle bytes wobble with compression and AQE
coalescing (x1.25 — both measured bit-identical across repeated runs
at the fixture, so the slack is pure headroom).
"""

from __future__ import annotations

import json
import os

import pytest

from customer_churn_prediction_spark.plans import registry
from customer_churn_prediction_spark.plans.audit import run_with_metrics

from .conftest import SF_TEST

_BUDGETS = json.load(
    open(os.path.join(os.path.dirname(__file__), "runtime_budgets.json"))
)

_default_fixture = SF_TEST == "/root/testdata/sf0.01"

RECORDS_SLACK = 1.2
BYTES_SLACK = 1.25
INPUT_BYTES_SLACK = 1.5  # trend context; file-granular at the fixture


@pytest.mark.skipif(
    not _default_fixture,
    reason="budgets bind only at the fixture they were generated against",
)
@pytest.mark.parametrize("name", sorted(_BUDGETS))
def test_runtime_volume_within_budget(spark, name):
    budget = _BUDGETS[name]
    # registered + staged surface (r15: dedup_fragments_incremental is
    # staged-tier but carries the same barriers)
    surface = {**registry.get_staged_queries(), **registry.QUERIES}
    got = run_with_metrics(
        spark,
        lambda: surface[name](spark, SF_TEST),
        f"runtime-guard-{name}",
    )
    assert got["input_records"] <= budget["input_records"] * RECORDS_SLACK, (
        f"{name}: read {got['input_records']} source records, budget "
        f"{budget['input_records']} (x{RECORDS_SLACK}) — a scan below a "
        "checkpoint barrier grew; if deliberate, regenerate "
        "tests/runtime_budgets.json via scripts/gen_runtime_budgets.py"
    )
    assert got["input_bytes"] <= budget["input_bytes"] * INPUT_BYTES_SLACK, (
        f"{name}: read {got['input_bytes']} source bytes, budget "
        f"{budget['input_bytes']} (x{INPUT_BYTES_SLACK}) — source bytes "
        "below a checkpoint barrier grew; if deliberate, regenerate "
        "tests/runtime_budgets.json via scripts/gen_runtime_budgets.py"
    )
    assert (
        got["shuffle_write_bytes"]
        <= budget["shuffle_write_bytes"] * BYTES_SLACK
    ), (
        f"{name}: wrote {got['shuffle_write_bytes']} shuffle bytes, budget "
        f"{budget['shuffle_write_bytes']} (x{BYTES_SLACK}) — a shuffle below "
        "a checkpoint barrier grew; if deliberate, regenerate "
        "tests/runtime_budgets.json via scripts/gen_runtime_budgets.py"
    )


def test_every_guarded_query_is_registered():
    surface = {**registry.get_staged_queries(), **registry.QUERIES}
    missing = sorted(set(_BUDGETS) - set(surface))
    assert not missing, f"budget rows without a registered query: {missing}"
