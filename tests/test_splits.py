"""corpus_split_leakproof (text/splits.py) — staged registry candidate;
oracle parity at driver rigor plus the no-leakage guarantee against the
pairwise LSH candidates.

The component computation is the expensive part (iterative label
propagation), so the module computes the split/components/groups frames
ONCE via module-scoped fixtures — re-deriving them per test tripled the
suite's tail memory pressure for no extra coverage."""

from __future__ import annotations

import pytest

from customer_churn_prediction_spark.text import dedup, splits

from .oracle_utils import assert_matches_oracle


@pytest.fixture(scope="module")
def split_rows(spark, sf_dir):
    return splits.corpus_split_leakproof(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def comp_rows(spark, sf_dir):
    return dedup.lsh_dedup_components(spark, sf_dir).collect()


def test_split_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        splits.corpus_split_leakproof(spark, sf_dir),
        splits.SPLIT_ORACLE,
        sf_dir,
    )


def test_split_covers_every_doc_exactly_once(spark, sf_dir, split_rows):
    n_docs = dedup.dedup_exact(spark, sf_dir).agg(
        {"n_copies": "sum"}
    ).collect()[0][0]
    assert len(split_rows) == n_docs
    assert len({r.doc_id for r in split_rows}) == n_docs
    assert {r.split for r in split_rows} <= {"train", "val", "test"}


def test_no_candidate_pair_straddles_splits(spark, sf_dir, split_rows):
    """THE property: every LSH candidate near-dup pair — including
    transitive chains — must land in one split. Checked against the
    pairwise candidate set, which is exactly the edge set the
    components close over."""
    split_of = {r.doc_id: r.split for r in split_rows}
    pairs = dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    assert pairs, "fixture must contain candidate pairs"
    straddlers = [
        (p.doc_a, p.doc_b)
        for p in pairs
        if split_of[p.doc_a] != split_of[p.doc_b]
    ]
    assert not straddlers, straddlers[:5]


def test_one_sweep_groups_would_leak_here(spark, sf_dir, comp_rows):
    """Documents WHY the operator pays for transitive components: the
    one-sweep group representative differs from the component label on
    this fixture (chained near-dups), so a group-keyed split could
    straddle. If the fixture ever loses its chains this guard flags
    the doc comment for review rather than silently weakening."""
    groups = {
        r.doc_id: r.group_rep
        for r in dedup.lsh_dedup_groups(spark, sf_dir).collect()
    }
    comps = {r.doc_id: r.label for r in comp_rows}
    assert groups != comps


def test_split_is_pure_function_of_component_label(split_rows):
    by_label: dict[int, set] = {}
    for r in split_rows:
        by_label.setdefault(r.group_label, set()).add(r.split)
    assert all(len(s) == 1 for s in by_label.values())


def test_split_fractions_roughly_honored(split_rows):
    """Across components the md5 cut should land near 80/10/10 (by
    component, not by doc — a mega-component drags doc fractions, which
    is inherent to any leak-proof split)."""
    by_comp = {}
    for r in split_rows:
        by_comp[r.group_label] = r.split
    n = len(by_comp)
    train = sum(1 for s in by_comp.values() if s == "train") / n
    val = sum(1 for s in by_comp.values() if s == "val") / n
    test = sum(1 for s in by_comp.values() if s == "test") / n
    assert 0.70 <= train <= 0.90
    assert 0.03 <= val <= 0.20
    assert 0.03 <= test <= 0.20
