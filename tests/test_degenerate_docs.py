"""Degenerate-document parity (ADVICE r3): empty / whitespace-only /
sub-3-word docs hit division-by-zero paths where Spark yields NULL but
DuckDB yields IEEE NaN — and NaN compares ABOVE every threshold in
DuckDB's total order, so an unguarded oracle diverges exactly on the
rows a real crawl corpus is full of. The main fixture happens to
contain no such docs, so this fixture manufactures them:

* zero-char and whitespace-only docs (quality score 0/0),
* banded-but-gram-less docs — >= 5 chars (so they get MinHash bands
  and become LSH candidates) but < 3 words (so their word-3-gram set
  is empty and pairwise Jaccard is 0/0),
* the same split across the incremental new/corpus residue classes.

Each affected query is run against its committed oracle SQL on the
synthetic corpus — the same comparison the driver applies.
"""

from __future__ import annotations

import os
import shutil

import pytest

from customer_churn_prediction_spark.catalog import TABLES
from customer_churn_prediction_spark.plans import get_oracles, get_queries
from customer_churn_prediction_spark.text.dedup import (
    INCREMENTAL_MOD,
    INCREMENTAL_NEW_RESIDUE,
)

from .conftest import SF_SMOKE
from .oracle_utils import assert_matches_oracle

# doc_id chosen so the identical banded-but-gram-less "hello" docs
# land on BOTH sides of the incremental residue split (3 % 10 < 8 →
# corpus side, 8 % 10 >= 8 → new side) and also form a plain candidate
# pair for dedup_lsh_verified.
_DOCS = [
    (1, ""),
    (2, "   "),
    (3, "hello"),
    (INCREMENTAL_NEW_RESIDUE, "hello"),
    (11, "hi you"),  # >= 5 chars, 2 words: banded, zero grams
    (12, "the cat sat on the mat and the dog sat too"),
    (13, "the cat sat on the mat and the dog sat too"),
    (INCREMENTAL_MOD + INCREMENTAL_NEW_RESIDUE,
     "the cat sat on the mat and the dog sat too"),
    (15, "completely different words about query engines and shuffles"),
    # doc_id % 10 == 7 → contamination_check's benchmark side; a
    # near-dup of docs 12/13 so the decontamination join has a hit.
    (17, "the cat sat on the mat and the dog sat too"),
]

AFFECTED = [
    "text_stats",
    "text_token_counts",
    "corpus_curation",
    "corpus_sample_stratified",
    "dedup_incremental",
    "dedup_lsh_groups",
    "dedup_lsh_components",
    # r5 governance tier: empty docs exercise the NULL-ratio routes
    # (repetition fractions, logprob over the ['']-token), the
    # single-token doc the zero-bigram branch, and doc 17 the
    # benchmark-overlap hit path. (text_repetition / text_logprob
    # retired r13 — their degenerate coverage moved to the
    # module-level retired-twin test below, the lsh_verified
    # precedent; corpus_keep_decision still composes both here.)
    "corpus_mix",
    "contamination_check",
    "corpus_keep_decision",
    # r13 graduations: the bigram scorer's zero-pair branch (the
    # single-token doc) and the A-ES sampler over empty/NULL-length
    # docs join the parametrized net in their registration round.
    "text_logprob_bigram",
    "corpus_sample_weighted",
]


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("degenerate_sf")
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, root / f"{t}.parquet")
    rows = [
        (doc_id, text, "en", f"src{doc_id}", len(text))
        for doc_id, text in _DOCS
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1)
    staging = str(root / "_documents_staging")
    df.write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    shutil.move(os.path.join(staging, part), root / "documents.parquet")
    shutil.rmtree(staging)
    return str(root)


@pytest.mark.parametrize("name", AFFECTED)
def test_degenerate_docs_match_oracle(name, spark, degenerate_dir):
    queries, oracles = get_queries(), get_oracles()
    assert_matches_oracle(
        queries[name](spark, degenerate_dir), oracles[name], degenerate_dir
    )


def test_degenerate_docs_lsh_verified_retired_twin(spark, degenerate_dir):
    """dedup_lsh_verified retired to dedup_recall_eval in r12 (its
    registry row is gone, so the parametrized fetch above can no
    longer reach it) — the banded-but-gram-less candidate pair this
    corpus manufactures (docs 11/3: >=5 chars so they band, <3 words
    so the gram set is empty and Jaccard is 0/0) stays covered at the
    module level, same committed oracle."""
    from customer_churn_prediction_spark.text import dedup

    assert_matches_oracle(
        dedup.lsh_verified_pairs(spark, degenerate_dir),
        dedup.ORACLES["dedup_lsh_verified"],
        degenerate_dir,
    )


def test_degenerate_docs_retired_governance_twins(spark, degenerate_dir):
    """text_repetition and text_logprob retired to corpus_keep_decision
    in r13 (their registry rows are gone, so the parametrized fetch
    above can no longer reach them) — the degenerate routes they
    exercised (NULL-ratio fractions on empty docs, the ['']-token
    logprob) stay covered at the MODULE level, same committed
    oracles."""
    from customer_churn_prediction_spark.text import analysis

    assert_matches_oracle(
        analysis.text_repetition(spark, degenerate_dir),
        analysis.ORACLES["text_repetition"],
        degenerate_dir,
    )
    assert_matches_oracle(
        analysis.text_logprob(spark, degenerate_dir),
        analysis.ORACLES["text_logprob"],
        degenerate_dir,
    )


def test_degenerate_docs_staged_dup_spans(spark, degenerate_dir):
    """Staged r6 query: empty/whitespace/sub-K docs must keep parity
    (each yields one NULL occurrence row and zero coverage), and the
    four identical 11-word docs must come out fully covered."""
    from customer_churn_prediction_spark.text import spans

    assert_matches_oracle(
        spans.dup_span_stats(spark, degenerate_dir),
        spans.DUP_SPAN_ORACLE,
        degenerate_dir,
    )
    out = {
        r.doc_id: r
        for r in spans.dup_span_stats(spark, degenerate_dir).collect()
    }
    assert out[12].dup_fraction == 1.0  # 4 identical copies
    assert out[1].covered_tokens == 0
    assert out[2].covered_tokens == 0
    assert out[3].covered_tokens == 0  # 1 token < K


def test_degenerate_docs_staged_clean_spans(spark, degenerate_dir):
    """The actuation form shares the tokenizer edge cases: parity on
    the degenerate corpus, the 4 identical copies empty out, and
    sub-K docs keep their text verbatim (lowercased/trimmed)."""
    from customer_churn_prediction_spark.text import spans

    assert_matches_oracle(
        spans.clean_spans(spark, degenerate_dir),
        spans.CLEAN_SPANS_ORACLE,
        degenerate_dir,
    )
    out = {
        r.doc_id: r
        for r in spans.clean_spans(spark, degenerate_dir).collect()
    }
    assert out[12].text_clean == ""
    assert out[12].n_removed == out[12].n_tokens
    assert out[3].text_clean == "hello"
    assert out[3].n_removed == 0


def test_degenerate_docs_staged_text_entropy(spark, degenerate_dir):
    """Entropy edge cases: a zero-char doc is one ''-token (entropy
    exactly 0 — the -0.0 sign is normalized, which this corpus is the
    regression test for); the repeated cat-sat docs agree with a hand
    computation; and parity holds against the committed oracle on the
    whole degenerate corpus."""
    from customer_churn_prediction_spark.text import analysis

    assert_matches_oracle(
        analysis.text_entropy(spark, degenerate_dir),
        analysis.STAGED_ORACLES["text_entropy"],
        degenerate_dir,
    )
    out = {
        r.doc_id: r
        for r in analysis.text_entropy(spark, degenerate_dir).collect()
    }
    empty = out[1]
    assert (empty.n_tokens, empty.distinct_tokens) == (1, 1)
    assert empty.entropy_bits == 0.0 and empty.ttr == 1.0
    import math

    # "the cat sat on the mat and the dog sat too": 11 tokens,
    # the x3, sat x2, six singletons
    probs = [3 / 11, 2 / 11] + [1 / 11] * 6
    want = round(-sum(p * math.log2(p) for p in probs), 2)
    assert abs(out[12].entropy_bits - want) < 0.02
    assert out[12].n_tokens == 11 and out[12].distinct_tokens == 8
