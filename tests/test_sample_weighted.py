"""corpus_sample_weighted (text/analysis.py, staged r11, graduated r13): A-ES
weighted without-replacement sampling — oracle parity plus the
properties that make the draw a correct weighted sample."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.text import analysis

from .oracle_utils import assert_matches_oracle


def test_weighted_sample_oracle_parity(spark, sf_dir):
    assert_matches_oracle(
        analysis.corpus_sample_weighted(spark, sf_dir),
        analysis.ORACLES["corpus_sample_weighted"],
        sf_dir,
    )


def test_sample_is_k_ranked_and_deterministic(spark, sf_dir):
    a = analysis.corpus_sample_weighted(spark, sf_dir).collect()
    b = analysis.corpus_sample_weighted(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == analysis.SAMPLE_W_K
    assert sorted(r.rank for r in a) == list(
        range(1, analysis.SAMPLE_W_K + 1)
    )
    # ranks follow the documented total order
    by_rank = sorted(a, key=lambda r: r.rank)
    keys = [(-r.logkey, r.doc_id) for r in by_rank]
    assert keys == sorted(keys)


def test_sample_is_length_biased(spark, sf_dir):
    """Inclusion ∝ n_chars: the sample's mean doc length must exceed
    the corpus mean by a clear margin (the draw exists to be
    token-budget-proportional, not doc-uniform)."""
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    sample_mean = (
        analysis.corpus_sample_weighted(spark, sf_dir)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > 1.05 * corpus_mean, (sample_mean, corpus_mean)


def test_topk_plans_a_heap_not_a_global_sort(spark, sf_dir):
    """The scale claim: orderBy.limit must plan TakeOrderedAndProject
    (per-partition K-heap + driver merge), never a corpus-wide Sort
    feeding the limit."""
    df = analysis.corpus_sample_weighted(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
