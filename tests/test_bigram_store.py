"""The maintained bigram LM (streaming/bigram.py, twelfth family,
r13): serve equality with the inline fit, and the add-one floor for
tokens the lake never saw — the contract-matrix cells live in
tests/test_maintained_stores.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.streaming import bigram as sbg
from customer_churn_prediction_spark.text import analysis


def _ingest(spark, docs, tmp_path, slices=3):
    stream_dir = str(tmp_path / "arrivals")
    for i in range(slices):
        docs.where(F.col("doc_id") % slices == i).repartition(
            1
        ).write.mode("append").parquet(stream_dir)
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = sbg.maintain_bigram_lm(
        spark, stream, store, checkpoint=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    return store


def test_store_served_scores_equal_inline(spark, sf_smoke, tmp_path):
    """Ingest the whole corpus (sliced across three micro-batches),
    then logprob_report against the maintained counts must equal the
    inline text_logprob_bigram (which refits per call) row-for-row —
    integer count partials sum exactly, and both paths share
    _bigram_lm + _score_pairs_against_lm."""
    d = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    store = _ingest(spark, d, tmp_path)
    served = sorted(
        map(tuple, sbg.logprob_report(spark, store, d).collect())
    )
    inline = sorted(
        map(
            tuple,
            analysis.text_logprob_bigram(spark, sf_smoke).collect(),
        )
    )
    assert served == inline and served


def test_novel_docs_score_addone_floor_not_silent_drop(
    spark, sf_smoke, tmp_path
):
    """Score a doc the lake has NEVER seen, made of a token absent
    from the vocabulary: the pair must score
    -ln(BACKOFF · 1/(n_corpus + n_vocab)) — the add-one smoothing
    evaluated at tf=0 — with n_pairs counting it, never a silent
    drop (the r13 session-anomaly discipline)."""
    d = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    store = _ingest(spark, d, tmp_path, slices=1)
    tot = (
        sbg.current_vocab(spark, store)
        .agg(
            F.sum("tf").cast("long").alias("n_corpus"),
            F.count(F.lit(1)).cast("long").alias("n_vocab"),
        )
        .collect()[0]
    )
    floor_nll = round(
        -math.log(
            analysis.BIGRAM_BACKOFF / (tot.n_corpus + tot.n_vocab)
        ),
        6,
    )
    novel = spark.createDataFrame(
        [(999_999_001, "zzzqqqxx zzzqqqxx")], "doc_id long, text string"
    )
    row = sbg.logprob_report(spark, store, novel).collect()[0]
    assert row.n_pairs == 1
    assert row.mean_nll == floor_nll and row.mean_nll is not None


def test_seen_token_unseen_bigram_backs_off_to_p1(
    spark, sf_smoke, tmp_path
):
    """The middle backoff tier: both tokens known, the bigram never
    observed — the pair scores BACKOFF · p1(w) with p1 the add-one
    unigram, exactly the inline op's backoff branch."""
    rows = [
        (1, "alpha beta"),
        (2, "beta alpha"),
        (3, "alpha alpha"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    store = _ingest(spark, d, tmp_path, slices=1)
    # bigram (beta, beta) never occurs; beta tf=2, corpus 6 tokens,
    # vocab 2 -> p1(beta) = (2+1)/(6+2)
    probe = spark.createDataFrame(
        [(10, "beta beta")], "doc_id long, text string"
    )
    row = sbg.logprob_report(spark, store, probe).collect()[0]
    expect = round(-math.log(analysis.BIGRAM_BACKOFF * 3.0 / 8.0), 6)
    assert (row.n_pairs, row.mean_nll) == (1, expect)
