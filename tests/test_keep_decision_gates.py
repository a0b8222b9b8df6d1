"""corpus_keep_decision gate-level contract (r10, VERDICT r9 item 3).

Two claims the composed governance decision now makes:

1. **Composability** — every gate column equals a recomputation from
   the SAME standalone query it claims to compose (quality /
   text_repetition / text_logprob / text_entropy / contamination),
   so the composition can never silently fork from its parts.
2. **Non-redundancy of the entropy gate** — the Gopher token-fraction
   rules imply an absolute entropy floor (~1.2 + 0.3*log2 n bits) for
   any doc they pass, so a useful entropy gate must be RELATIVE to
   length. This file constructs the adversarial document the relative
   gate exists for: a few stuffed keywords padded with singleton noise
   and SHUFFLED (defeating the positional top-bigram rule). It passes
   all three repetition ratios yet carries evenness < 0.55, and only
   the entropy gate rejects it — proven in BOTH engines.
"""

from __future__ import annotations

import math
import os
import random
import shutil

import pytest

from customer_churn_prediction_spark.catalog import TABLES
from customer_churn_prediction_spark.text import analysis as A

from .conftest import SF_SMOKE
from .oracle_utils import assert_matches_oracle


def test_gate_columns_equal_standalone_queries(spark, sf_dir):
    """Each flag in the composed decision is byte-equal to the gate
    recomputed from the standalone registered/staged query."""
    got = {
        r.doc_id: r
        for r in A.corpus_keep_decision(spark, sf_dir).collect()
    }
    rep = {
        r.doc_id: not r.repetitive
        for r in A.text_repetition(spark, sf_dir).collect()
    }
    nll = {
        r.doc_id: r.mean_nll <= A.NLL_MAX
        for r in A.text_logprob(spark, sf_dir).collect()
    }
    ent = {
        r.doc_id: (
            r.n_tokens < A.ENTROPY_MIN_TOKENS
            or r.entropy_bits
            >= A.ENTROPY_EVENNESS_MIN * math.log2(r.n_tokens)
        )
        for r in A.text_entropy(spark, sf_dir).collect()
    }
    assert got  # governed (non-benchmark) docs exist
    for doc_id, r in got.items():
        assert r.repetition_ok == rep[doc_id], doc_id
        assert r.nll_ok == nll.get(doc_id, False), doc_id
        assert r.entropy_ok == ent.get(doc_id, True), doc_id
        assert r.keep == (
            r.quality_ok and r.repetition_ok and r.nll_ok
            and r.entropy_ok and r.decontam_ok
        ), doc_id


def test_fixture_corpus_clears_the_evenness_floor(spark, sf_dir):
    """The gate is a degenerate-doc backstop, not a sampler: every
    fixture doc sits above the 0.55 evenness floor (measured margin:
    the corpus bottoms out above 0.60)."""
    rows = A.text_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_tokens >= A.ENTROPY_MIN_TOKENS:
            assert r.entropy_bits >= 0.60 * math.log2(r.n_tokens), (
                r.doc_id, r.entropy_bits, r.n_tokens
            )


def _stuffed_shuffled_doc() -> str:
    """3 keywords x 56 + 72 singleton noise tokens = 240 tokens,
    deterministically shuffled. Designed to pass every Gopher ratio:
    distinct/total = 75/240 > 0.30 (dup rule), top token 56/240 < 0.30,
    and the shuffle spreads bigrams far below 0.18."""
    toks = ["spamword" + str(i) for i in range(3)] * 56
    toks += ["noise" + str(i) for i in range(72)]
    random.Random(7).shuffle(toks)
    return " ".join(toks)


_ADVERSARIAL_ID = 101  # % 10 == 1: training side of every residue split
_DOCS = [
    (_ADVERSARIAL_ID, _stuffed_shuffled_doc()),
    # companions so corpus-model queries (logprob) see a vocabulary
    (102, "ordinary prose about query engines and shuffle planning"),
    (103, "another plain document with mostly distinct tokens here"),
    (104, "the third companion document keeps the corpus nontrivial"),
]


@pytest.fixture(scope="module")
def stuffed_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stuffed_sf")
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, root / f"{t}.parquet")
    rows = [
        (doc_id, text, "en", f"src{doc_id}", len(text))
        for doc_id, text in _DOCS
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
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


def test_entropy_gate_catches_shuffled_stuffing(spark, stuffed_dir):
    """The adversarial doc passes text_repetition (all three Gopher
    ratios inside threshold — assert each, so the construction cannot
    silently rot) but fails the evenness floor; the composed decision
    drops it on entropy_ok ALONE among the distributional gates."""
    rep = {
        r.doc_id: r
        for r in A.text_repetition(spark, stuffed_dir).collect()
    }
    r = rep[_ADVERSARIAL_ID]
    assert r.dup_token_frac <= A.REPETITION_DUP_TOKEN_MAX, r
    assert r.top_token_frac <= A.REPETITION_TOP_TOKEN_MAX, r
    assert r.top_bigram_frac <= A.REPETITION_TOP_BIGRAM_MAX, r
    assert not r.repetitive

    ent = {
        r.doc_id: r for r in A.text_entropy(spark, stuffed_dir).collect()
    }
    e = ent[_ADVERSARIAL_ID]
    assert e.n_tokens == 240 and e.distinct_tokens == 75
    evenness = e.entropy_bits / math.log2(e.n_tokens)
    assert evenness < A.ENTROPY_EVENNESS_MIN, evenness

    keep = {
        r.doc_id: r
        for r in A.corpus_keep_decision(spark, stuffed_dir).collect()
    }
    k = keep[_ADVERSARIAL_ID]
    assert k.repetition_ok and not k.entropy_ok and not k.keep


def test_keep_decision_oracle_parity_on_adversarial_corpus(
    spark, stuffed_dir
):
    """Driver-rigor parity on the constructed corpus — the entropy CTE
    and the relative comparison fold identically in both engines."""
    assert_matches_oracle(
        A.corpus_keep_decision(spark, stuffed_dir),
        A.ORACLES["corpus_keep_decision"],
        stuffed_dir,
    )
