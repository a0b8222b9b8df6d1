"""DSIR importance-resampling selection: the property the op exists
for, on a corpus constructed so the right answer is known.

Oracle parity for ``corpus_select_dsir`` (bit-exact md5 buckets) is
the driver's job since its r10 graduation (CORRECTNESS rows); this
file pins the selection semantics:

- documents that LOOK like the target distribution outrank documents
  that don't, regardless of their own lang tag (the entire point of
  importance resampling — the lang column defines the target model,
  but selection is by distributional similarity, not by the tag);
- the keep fraction is honored exactly with deterministic ties;
- degenerate docs (empty text) score and rank instead of crashing or
  vanishing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.text.selection import (
    DSIR_KEEP_FRAC,
    dsir_report,
)

_TARGETY = "the quick brown fox jumps over the lazy dog again and again"
_ALIEN = "zzq xkcd qwerty asdf zxcv uiop hjkl vbnm qaz wsx edc rfv"


def _corpus(spark):
    """40 docs: 10 English target docs with a distinctive vocabulary,
    15 non-English docs SHARING that vocabulary (should be selected —
    they look like the target), 15 non-English docs with alien
    vocabulary (should not be)."""
    rows = []
    for i in range(10):
        rows.append((i, "en", _TARGETY + f" t{i % 3}"))
    for i in range(10, 25):
        rows.append((i, "de", _TARGETY + f" t{i % 3}"))
    for i in range(25, 40):
        rows.append((i, "de", _ALIEN + f" a{i % 3}"))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_targetlike_docs_outrank_alien_docs(spark):
    out = dsir_report(_corpus(spark)).collect()
    w = {r.doc_id: r.logweight for r in out}
    targetlike = [w[i] for i in range(10, 25)]
    alien = [w[i] for i in range(25, 40)]
    assert min(targetlike) > max(alien)
    sel = {r.doc_id for r in out if r.selected}
    # top 25% of 40 docs = 10 slots, all taken by target-vocabulary
    # docs (the en originals and the de lookalikes tie at the top —
    # deterministic doc_id tie-break, never an alien doc)
    assert len(sel) == 10
    assert sel.issubset(set(range(25)))


def test_keep_fraction_and_determinism(spark):
    out1 = dsir_report(_corpus(spark)).collect()
    out2 = dsir_report(_corpus(spark)).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    n_sel = sum(r.selected for r in out1)
    import math

    assert n_sel == math.ceil(DSIR_KEEP_FRAC * len(out1))


def test_empty_and_single_token_docs_survive(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "hello world hello"),
            (2, "de", ""),          # empty: one '' unigram, no bigram
            (3, "de", "hello"),     # single token: no bigrams
        ],
        "doc_id long, lang string, text string",
    )
    out = {r.doc_id: r for r in dsir_report(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].n_grams == 1  # the '' token
    assert out[3].n_grams == 1  # 'hello', no bigram
    assert out[1].n_grams == 5  # 3 unigrams + 2 bigrams
    for r in out.values():
        assert r.logweight is not None
