"""dedup_recall_eval (text/dedup.py — registered since r10): the
banding-quality report — oracle parity plus the structural invariants
that make the numbers trustworthy (verified pairs are a subset of
exact truth, so hits == verified; ratios live in (0, 1]). Also pins
standalone parity for the r10-retired dedup_ngram_jaccard, whose SQL
is this report's ground-truth CTE (registry.RETIRED)."""

from __future__ import annotations

from customer_churn_prediction_spark.text import dedup

from .oracle_utils import assert_matches_oracle


def test_recall_eval_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        dedup.dedup_recall_eval(spark, sf_dir),
        dedup.ORACLES["dedup_recall_eval"],
        sf_dir,
    )


def test_recall_eval_invariants(spark, sf_dir):
    row = dedup.dedup_recall_eval(spark, sf_dir).collect()[0]
    assert row.n_true_pairs > 0, "fixture must contain true near-dups"
    # verify uses the SAME exact-Jaccard definition as the truth set,
    # so every verified pair IS a true pair: hits == verified, and
    # recall is exactly verified/truth
    assert row.n_hits == row.n_verified
    assert 0.0 < row.recall <= 1.0
    # banding trades candidate volume for recall: candidates must be a
    # superset of what survives verification
    assert row.n_candidates >= row.n_verified
    assert 0.0 < row.candidate_precision <= 1.0


def test_ngram_jaccard_oracle_parity(spark, sf_dir):
    """Retired-baseline contract (registry.RETIRED, r10): the exact
    O(n²) ngram-Jaccard pair query keeps driver-rigor oracle parity
    here even though its registry row is gone — its SQL is the truth
    CTE inside dedup_recall_eval's oracle, so both engines must agree
    on it standalone too."""
    assert_matches_oracle(
        dedup.ngram_jaccard_pairs(spark, sf_dir),
        dedup.ORACLES["dedup_ngram_jaccard"],
        sf_dir,
    )


def test_lsh_verified_oracle_parity(spark, sf_dir):
    """Retired-twin contract (registry.RETIRED, r12): the banded-LSH
    verified pipeline keeps driver-rigor oracle parity here even
    though its registry row is gone — its Spark fn is the `found`
    frame inside the registered dedup_recall_eval (and the text side
    of dedup_cross_modal), and its SQL is that oracle's `found` CTE,
    so both engines must agree on it standalone too."""
    assert_matches_oracle(
        dedup.lsh_verified_pairs(spark, sf_dir),
        dedup.ORACLES["dedup_lsh_verified"],
        sf_dir,
    )
