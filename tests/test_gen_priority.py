"""The rotation is generated, not hand-kept (VERDICT r8 item 3).

``scripts/gen_priority.py`` derives the next-round PRIORITY from the
committed CORRECTNESS history (stale entries in module-flat order,
never-proven registrations last). This test pins ``registry.PRIORITY``
to that derivation, so a hand edit that drops, reorders, or misplaces
an entry fails here — and when the driver lands a new
``CORRECTNESS_r{N}.json``, this test and the rotation tripwire fire
together until ``python scripts/gen_priority.py --write`` is run.
"""

import importlib.util
import os

from customer_churn_prediction_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _gen_priority():
    spec = importlib.util.spec_from_file_location(
        "gen_priority", os.path.join(REPO, "scripts", "gen_priority.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_priority_equals_derivation():
    gen = _gen_priority()
    derived = gen.derive_priority()
    assert registry.PRIORITY == derived, (
        "registry.PRIORITY diverges from scripts/gen_priority.py — run "
        "`python scripts/gen_priority.py --write` (and re-prove any "
        "newly listed entries this round)"
    )


def test_derivation_fits_driver_budget():
    gen = _gen_priority()
    assert len(gen.derive_priority()) <= 50


def test_write_mode_round_trips(tmp_path):
    """--write must regenerate exactly the committed PRIORITY block."""
    gen = _gen_priority()
    rounds = gen.history()
    block = gen.render(gen.derive_priority(rounds), max(rounds))
    with open(gen.REGISTRY_PATH) as f:
        src = f.read()
    assert block in src, (
        "the PRIORITY block in registry.py is not byte-identical to the "
        "generator's rendering — regenerate with --write"
    )
