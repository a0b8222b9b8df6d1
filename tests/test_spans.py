"""Duplicate-span detection (text/spans.py) — staged for the r6
registry; until then this file enforces the same oracle parity the
driver would, plus constructed-corpus semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.text import spans

from .oracle_utils import assert_matches_oracle


def test_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        spans.dup_span_stats(spark, sf_dir),
        spans.DUP_SPAN_ORACLE,
        sf_dir,
    )


def test_covers_every_document_with_sane_bounds(spark, sf_dir):
    stats = spans.dup_span_stats(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(stats) == n_docs
    for r in stats:
        assert 0 <= r.covered_tokens <= r.n_tokens
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.dup_starts <= max(r.n_tokens - spans.DUP_SPAN_K + 1, 0)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_fully_covered(spark):
    text = "a b c d e f g h i j"  # 10 tokens
    out = {
        r.doc_id: r
        for r in spans.dup_span_frame(
            _docs(spark, [(1, text), (2, text), (3, "k l m n o p q r")])
        ).collect()
    }
    for d in (1, 2):
        assert out[d].n_tokens == 10
        assert out[d].dup_starts == 6  # positions 1..6
        assert out[d].covered_tokens == 10
        assert out[d].dup_fraction == 1.0
    assert out[3].dup_starts == 0
    assert out[3].covered_tokens == 0
    assert out[3].dup_fraction == 0.0


def test_partial_overlap_covers_only_the_shared_span(spark):
    shared = "one two three four five"  # exactly K tokens
    out = {
        r.doc_id: r
        for r in spans.dup_span_frame(
            _docs(
                spark,
                [
                    (1, f"{shared} alpha beta gamma delta epsilon"),
                    (2, f"zeta eta theta iota kappa {shared}"),
                ],
            )
        ).collect()
    }
    # one dup gram each, covering exactly K tokens
    for d in (1, 2):
        assert out[d].dup_starts == 1
        assert out[d].covered_tokens == spans.DUP_SPAN_K
        assert out[d].n_tokens == 10
        assert out[d].dup_fraction == 0.5


def test_within_document_repetition_counts(spark):
    # the same 5-gram twice INSIDE one doc -> duplicated corpus-wide
    text = "x1 x2 x3 x4 x5 sep x1 x2 x3 x4 x5"
    row = spans.dup_span_frame(_docs(spark, [(1, text)])).collect()[0]
    assert row.dup_starts == 2
    assert row.covered_tokens == 10
    assert row.n_tokens == 11


def test_sub_k_docs_report_zero(spark):
    row = spans.dup_span_frame(_docs(spark, [(1, "too short")])).collect()[0]
    assert row.n_tokens == 2
    assert (row.dup_starts, row.covered_tokens, row.dup_fraction) == (0, 0, 0.0)


def test_overlapping_spans_union_not_sum(spark):
    # doc 2 repeats doc 1's 6-token run: starts at pos 1 and 2 overlap;
    # union covers 6 tokens, not 10
    run = "r1 r2 r3 r4 r5 r6"
    out = {
        r.doc_id: r
        for r in spans.dup_span_frame(
            _docs(spark, [(1, f"{run} u1 u2 u3"), (2, f"v1 v2 {run}")])
        ).collect()
    }
    assert out[1].dup_starts == 2
    assert out[1].covered_tokens == 6
    assert out[2].dup_starts == 2
    assert out[2].covered_tokens == 6


# ------------------------------------------------------------ clean_spans


def test_clean_spans_oracle_parity_sf001(spark, sf_dir):
    assert_matches_oracle(
        spans.clean_spans(spark, sf_dir),
        spans.CLEAN_SPANS_ORACLE,
        sf_dir,
    )


def test_clean_spans_consistent_with_detection(spark, sf_dir):
    """n_removed must equal dup_span_stats' covered_tokens doc by doc
    (the two plans compute the same interval union two different
    ways), and the cleaned text must contain exactly the uncovered
    token count."""
    stats = {
        r.doc_id: r for r in spans.dup_span_stats(spark, sf_dir).collect()
    }
    for r in spans.clean_spans(spark, sf_dir).collect():
        s = stats[r.doc_id]
        assert r.n_tokens == s.n_tokens
        assert r.n_removed == s.covered_tokens
        expected_kept = r.n_tokens - r.n_removed
        kept = len(r.text_clean.split()) if r.text_clean.strip() else 0
        # a kept token can itself be the empty string (degenerate
        # whitespace-only docs tokenize to ['']), in which case
        # text_clean is "" while one token was kept
        assert kept == expected_kept or (
            kept == 0 and r.text_clean == ""
        ), (r.doc_id, r.text_clean)


def test_clean_spans_removes_the_copied_run(spark):
    run = "r1 r2 r3 r4 r5 r6"
    out = {
        r.doc_id: r
        for r in spans.clean_spans_frame(
            _docs(spark, [(1, f"{run} u1 u2 u3"), (2, f"v1 v2 {run}")])
        ).collect()
    }
    assert out[1].text_clean == "u1 u2 u3"
    assert out[1].n_removed == 6
    assert out[2].text_clean == "v1 v2"
    assert out[2].n_removed == 6


def test_clean_spans_fully_duplicated_doc_empties(spark):
    text = "a b c d e f g h i j"
    out = {
        r.doc_id: r
        for r in spans.clean_spans_frame(
            _docs(spark, [(1, text), (2, text)])
        ).collect()
    }
    for d in (1, 2):
        assert out[d].text_clean == ""
        assert out[d].n_removed == 10
