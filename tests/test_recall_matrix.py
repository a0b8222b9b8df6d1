"""ann_recall_matrix (similarity/recall.py) — staged registry
candidate; oracle parity at driver rigor plus the matrix's sanity
ordering (exact-ish tiers beat coarse ones on this fixture)."""

from __future__ import annotations

from customer_churn_prediction_spark.similarity import ann, recall

from .oracle_utils import assert_matches_oracle


def test_recall_matrix_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        recall.ann_recall_matrix(spark, sf_dir),
        recall.RECALL_MATRIX_ORACLE,
        sf_dir,
    )


def test_matrix_covers_every_tier_with_sane_values(spark, sf_dir):
    rows = {r.method: r for r in recall.ann_recall_matrix(spark, sf_dir).collect()}
    assert set(rows) == set(recall._METHODS)
    for r in rows.values():
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hits == round(r.recall * recall._DENOM)
    # the int8 store is a near-exact re-scoring: it must dominate the
    # coarse candidate-pruning tiers on this fixture
    assert rows["int8_bruteforce"].recall >= rows["lsh_bucketed"].recall
    assert rows["int8_bruteforce"].recall >= rows["ivf_pq"].recall
    # pruning can only lose candidates vs the same scorer: IVF-PQ's
    # recall cannot exceed full-scan ADC's
    assert rows["ivf_pq"].recall <= rows["pq_adc"].recall


def test_matrix_agrees_with_registered_lsh_eval(spark, sf_dir):
    """The matrix's LSH row must equal the registered per-query
    ann_recall_eval aggregated — two reports, one truth."""
    per_query = ann.ann_recall_eval(spark, sf_dir).collect()
    total_hits = sum(r.n_hit for r in per_query)
    matrix = {
        r.method: r for r in recall.ann_recall_matrix(spark, sf_dir).collect()
    }
    assert matrix["lsh_bucketed"].n_hits == total_hits
