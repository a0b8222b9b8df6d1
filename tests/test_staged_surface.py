"""Staged-operator surface guard: every module awaiting r6 registry
slots must already satisfy the registration contract — QUERIES
callables with the (spark, sf_dir) signature, a same-named ORACLES
entry per query, no name collisions with the live registry or among
staged modules — so r6's wiring (add to _MODULES + PRIORITY) is a
mechanical two-line edit, never a debugging session."""

from __future__ import annotations

import inspect

from customer_churn_prediction_spark.plans import registry

# Round 6 registered pq / spans / splits / calibration / sessions; the
# remainder stays pytest-only PERMANENTLY BY DESIGN — the driver's
# 50-row budget caps the registry at 100 provable-every-other-round
# entries and it sits at 99. The canonical module list lives in the
# registry (plans/registry.staged_modules) so the plan-golden
# generator and these contract tests can never drift apart.
STAGED_MODULES = registry.staged_modules()


def _staged():
    out = {}
    for mod in STAGED_MODULES:
        # A module that is ALSO registered (vocab since r7) splits its
        # staged remainder into STAGED_QUERIES/STAGED_ORACLES; a
        # staged-only module (selection since r9) may have no QUERIES
        # dict at all, so don't evaluate getattr's default eagerly.
        staged = getattr(mod, "STAGED_QUERIES", None)
        if staged is None:
            staged = mod.QUERIES
        for name, fn in staged.items():
            assert name not in out, f"staged name collision: {name}"
            out[name] = (mod, fn)
    return out


def _staged_oracles(mod):
    return {**getattr(mod, "ORACLES", {}),
            **getattr(mod, "STAGED_ORACLES", {})}


def test_staged_surface_is_registration_ready():
    staged = _staged()
    assert len(staged) >= 14  # 15 until r7 registered vocab_bpe_merges
    live = set(registry.get_queries())
    for name, (mod, fn) in staged.items():
        assert name not in live, f"{name} staged AND registered"
        assert callable(fn)
        params = list(inspect.signature(fn).parameters)
        assert params[:2] == ["spark", "sf_dir"], (name, params)
        oracles = _staged_oracles(mod)
        assert name in oracles, f"{name} has no oracle"
        sql = oracles[name]
        assert isinstance(sql, str) and "SELECT" in sql.upper()


def test_staged_correctness_artifact_is_current_and_green():
    """STAGED_CORRECTNESS.json (scripts/staged_driver_sim.py) makes the
    staged tier's oracle parity machine-visible next to the driver's
    CORRECTNESS_r{N}.json chain. It must cover exactly the current
    staged surface and be all-green — regenerate it whenever a staged
    query is added, removed, graduated, or changed."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STAGED_CORRECTNESS.json",
    )
    assert os.path.exists(path), (
        "run: python scripts/staged_driver_sim.py"
    )
    with open(path) as fh:
        rows = json.load(fh)
    assert set(rows) == set(_staged()), (
        "staged surface changed — regenerate STAGED_CORRECTNESS.json"
    )
    not_green = [n for n, r in rows.items() if not r.get("hash_match")]
    assert not not_green, not_green


def test_staged_oracles_parse_in_duckdb():
    """Every staged oracle must at least PLAN against the fixture
    views — a syntax error should fail here, not at r6 registration."""
    import duckdb

    from customer_churn_prediction_spark.catalog import TABLES

    from .conftest import SF_SMOKE

    con = duckdb.connect()
    sf = SF_SMOKE
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    for name, (mod, _) in _staged().items():
        sql = _staged_oracles(mod)[name]
        con.execute(f"EXPLAIN {sql}")  # plans without executing
