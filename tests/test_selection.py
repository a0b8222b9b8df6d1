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


def test_threshold_form_equals_exact_rank_twin(spark, sf_dir):
    """r11 scale form (approx-percentile band + band-only rank) must
    equal the r10 exact global-rank twin row-for-row — on the real
    sf fixture (band path: boundary falls inside the bracket) AND on
    the constructed tie-heavy corpus (fallback path: 25 docs tie at
    the top, the band_ok guard widens to the exact plan)."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.text.selection import (
        dsir_report_exact,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    got = sorted(map(tuple, dsir_report(docs).collect()))
    want = sorted(map(tuple, dsir_report_exact(docs).collect()))
    assert got == want

    tie_heavy = _corpus(spark)
    got = sorted(map(tuple, dsir_report(tie_heavy).collect()))
    want = sorted(map(tuple, dsir_report_exact(tie_heavy).collect()))
    assert got == want


def test_band_rank_window_sees_only_band_rows(spark, sf_dir):
    """The scale claim itself: on the sf fixture the boundary band
    the exact rank touches must be a small fraction of the corpus,
    not all of it (the r10 plan ranked every doc row through one
    task)."""
    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.text.selection import (
        _DSIR_BAND_EPS,
        _dsir_scored,
        dsir_report,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents", spread=True)
    out = dsir_report(docs)
    n = out.count()
    # Reconstruct the band bracket the report used and count its rows.
    scored = _dsir_scored(docs)
    from customer_churn_prediction_spark.text.selection import (
        DSIR_KEEP_FRAC,
        _DSIR_PCT_ACCURACY,
    )
    lo, hi = scored.agg(
        F.expr(
            f"approx_percentile(logweight, "
            f"{1.0 - DSIR_KEEP_FRAC - _DSIR_BAND_EPS!r}, "
            f"{_DSIR_PCT_ACCURACY})"
        ),
        F.expr(
            f"approx_percentile(logweight, "
            f"{1.0 - DSIR_KEEP_FRAC + _DSIR_BAND_EPS!r}, "
            f"{_DSIR_PCT_ACCURACY})"
        ),
    ).first()
    band = scored.where(
        (F.col("logweight") >= lo) & (F.col("logweight") <= hi)
    ).count()
    # sf0.01: 500 docs, eps=2e-3 → a handful of band rows; assert the
    # structural claim loosely (well under half the corpus).
    assert band < 0.2 * n, (band, n)


def test_band_cache_refits_on_same_count_reingest(spark, tmp_path):
    """The r11 latent seam (ADVICE r11 #1), closed in r12: the band
    memo fingerprinted only the doc COUNT, so a corpus re-ingested at
    the same path with an equal count but different content served
    stale (k, c_above, lo, hi) literals — and stale band stats make
    the EXACT-semantics ``selected`` flags wrong. The fingerprint is
    now a content hash; this test re-ingests a same-count corpus whose
    logweights sit far outside the first fit's band (text doubled →
    ~2× logweight scale) and demands the fresh, correct selection."""
    import math

    from customer_churn_prediction_spark.catalog import load_table
    from customer_churn_prediction_spark.text.selection import (
        corpus_select_dsir,
        dsir_report_exact,
    )

    path = str(tmp_path)
    out_path = f"{path}/documents.parquet"

    _corpus(spark).write.mode("overwrite").parquet(out_path)
    first = corpus_select_dsir(spark, path).collect()
    assert sum(r.selected for r in first) == math.ceil(
        DSIR_KEEP_FRAC * len(first)
    )

    # Re-ingest at the SAME path: same 40 doc_ids, but the target
    # vocabulary flips to the alien one and every text is doubled, so
    # the new logweight scale lands outside the cached band bracket.
    rows = []
    for i in range(10):
        rows.append((i, "en", (_ALIEN + f" a{i % 3} ") * 2))
    for i in range(10, 25):
        rows.append((i, "de", (_ALIEN + f" a{i % 3} ") * 2))
    for i in range(25, 40):
        rows.append((i, "de", (_TARGETY + f" t{i % 3} ") * 2))
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).write.mode("overwrite").parquet(out_path)

    got = sorted(map(tuple, corpus_select_dsir(spark, path).collect()))
    docs = load_table(spark, path, "documents", spread=True)
    want = sorted(map(tuple, dsir_report_exact(docs).collect()))
    assert got == want
    sel = {t[0] for t in got if t[3]}
    # top 25% of 40 docs = 10 slots, all from the (now alien-vocab)
    # target-lookalike group — a stale band would select 15 or 0.
    assert len(sel) == 10 and sel.issubset(set(range(25)))


def test_stored_selection_equals_inline(spark, sf_dir):
    """corpus_select_dsir_stored serves the identical selection from
    the at-rest score table (the at-rest-twin discipline) — same rows
    as the inline form, which the driver oracle-checks."""
    from customer_churn_prediction_spark.text.selection import (
        corpus_select_dsir,
        corpus_select_dsir_stored,
    )

    a = sorted(map(tuple, corpus_select_dsir(spark, sf_dir).collect()))
    b = sorted(
        map(tuple, corpus_select_dsir_stored(spark, sf_dir).collect())
    )
    assert a == b and a
