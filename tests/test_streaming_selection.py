"""DSIR-on-ingest: the frozen-model scoring twin of
``corpus_select_dsir``.

Contract mirrors the sibling ingest twins (dedup, fragments, ANN):
scoring each drop with the frozen model equals scoring the union in
one batch pass with the same model — across epoch slicings AND an
injected crash replay — plus the twin-specific legs: the frozen
threshold reproduces the batch selection on the fit corpus itself,
and novel vocabulary (buckets the fit corpus never populated) scores
with the smoothing-floor delta instead of being dropped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.streaming import (
    selection as ssel,
)
from customer_churn_prediction_spark.text.selection import (
    dsir_report,
)

from .conftest import CrashOnce, drain_to_exception as _drain

_COLS = "doc_id long, lang string, text string"


def _docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents").select(
        "doc_id", "lang", "text"
    )


def _rows(df):
    return sorted(
        (r.doc_id, r.n_grams, r.logweight, r.selected)
        for r in df.collect()
    )


def _run(spark, stream_dir, store, ckpt, model, fault=None):
    stream = (
        spark.readStream.schema(_COLS)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    return ssel.select_ingest_stream(
        spark, stream, model, store, checkpoint=ckpt, fault=fault
    )


def test_frozen_threshold_reproduces_batch_selection_on_fit_corpus(
    spark, sf_smoke
):
    """Scoring the fit corpus itself with the frozen model must
    reproduce the batch report row-for-row — including selection,
    because the frozen threshold IS the batch selection's minimum
    kept logweight. The two forms agree ONLY when no logweight tie
    straddles the cut (the batch rank cuts mid-tie by doc_id; the
    threshold form keeps all tied docs — ADVICE r9), so that
    precondition is asserted explicitly: if a fixture change ever
    introduces a boundary tie, this fails on the precondition line,
    not as an inscrutable row diff."""
    docs = _docs(spark, sf_smoke)
    model = ssel.freeze_model(docs)
    batch = dsir_report(docs)
    rows = _rows(batch)
    kept = [lw for (_d, _n, lw, sel) in rows if sel]
    dropped = [lw for (_d, _n, lw, sel) in rows if not sel]
    assert kept and dropped, "fixture must exercise both outcomes"
    assert min(kept) not in dropped, (
        "fixture has a logweight tie at the selection boundary — the "
        "batch and threshold forms legitimately diverge there"
    )
    scored = ssel.score_docs(spark, docs, model)
    assert _rows(scored) == rows


def test_epoch_union_equals_batch_scoring_across_crash_replay(
    spark, sf_smoke, tmp_path
):
    docs = _docs(spark, sf_smoke).cache()
    model = ssel.freeze_model(docs)
    waves = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    stream_dir = str(tmp_path / "arrivals")
    for w in waves:
        w.repartition(1).write.mode("append").parquet(stream_dir)

    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    crash = CrashOnce(at_epoch=1)
    q = _run(spark, stream_dir, store, ckpt, model, fault=crash)
    assert _drain(q) is not None, "fault must abort the first run"
    assert crash.fired
    q2 = _run(spark, stream_dir, store, ckpt, model)
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()

    got = ssel.read_scored(spark, store)
    want = ssel.score_docs(spark, docs, model)
    assert _rows(got) == _rows(want)
    # exactly-once: every doc scored once despite the replay
    assert got.count() == docs.count()
    assert got.select("doc_id").distinct().count() == docs.count()


def test_novel_vocabulary_scores_with_smoothing_floor(spark, sf_smoke):
    """A drop whose text shares nothing with the fit corpus must still
    score (no dropped gram rows, no NULL logweight), using the frozen
    unseen-bucket delta."""
    model = ssel.freeze_model(_docs(spark, sf_smoke))
    novel = spark.createDataFrame(
        [(999_001, "en", "qzxv wvvq zzzp qqqm vvvz")], _COLS
    )
    rows = ssel.score_docs(spark, novel, model).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_grams == 9  # 5 unigrams + 4 bigrams
    assert r.logweight is not None
    # not all nine buckets can be fit-populated by accident; the
    # score must be finite either way
    assert abs(r.logweight) < 1e6


def test_pre_first_epoch_read_answers_empty(spark, tmp_path):
    assert ssel.read_scored(spark, str(tmp_path / "never")).count() == 0


def test_freeze_model_on_empty_corpus_raises_cleanly(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], _COLS)
    with _pytest.raises(ValueError, match="empty"):
        ssel.freeze_model(empty)
