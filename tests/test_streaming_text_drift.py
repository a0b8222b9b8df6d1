"""Text-drift maintenance (streaming/text_drift.py): the text-modality
drift report maintained over an arriving document stream, compared
against the frozen at-rest corpus through the shared PSI formula and
the atomic _LATEST publish — completing the drift-twin matrix
(scalar / vector / text), with the sibling twins' exact contract:
shifted stream flags, identity stream ~0, restart converges."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.ml.drift_features import (
    _TD_FROM,
    _TD_TO,
)
from customer_churn_prediction_spark.streaming import text_drift as td
from customer_churn_prediction_spark.streaming.drift import read_report

_DOC_SCHEMA = "doc_id bigint, text string"


def _write_stream_dir(spark, sf_dir, dst, shift: bool) -> None:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if shift:
        # the batch op's deterministic drift injection: the
        # vowel-rotation cipher (vocabulary-shift stand-in)
        d = d.withColumn("text", F.translate("text", _TD_FROM, _TD_TO))
    d.select("doc_id", "text").repartition(2).write.mode(
        "overwrite"
    ).parquet(dst)


def _run(spark, sf_dir, tmp_path, tag: str, shift: bool):
    src = str(tmp_path / f"stream_{tag}")
    _write_stream_dir(spark, sf_dir, src, shift)
    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(src)
    report_path = str(tmp_path / f"report_{tag}")
    q = td.maintain_text_drift(
        spark, sf_dir, stream, report_path,
        checkpoint=str(tmp_path / f"ckpt_{tag}"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return report_path, src


def test_shifted_stream_flags_drift_and_matches_batch(
    spark, sf_smoke, tmp_path
):
    report_path, src = _run(spark, sf_smoke, tmp_path, "shift", shift=True)
    rep = read_report(spark, report_path).orderBy("bucket").collect()
    total = rep[0].psi_total
    assert all(r.psi_total == total for r in rep)
    assert total > 0.25  # the cipher clears the classic action band

    # batch equivalence: the same histogram pair through the batch
    # helpers must produce the identical report
    baseline = td.baseline_vocab_histogram(spark, sf_smoke)
    cur = td.streaming_vocab_histogram(spark.read.parquet(src))
    want = td.vocab_psi_report(spark, baseline, cur).orderBy(
        "bucket"
    ).collect()
    assert [tuple(r) for r in rep] == [tuple(r) for r in want]


def test_identity_stream_scores_near_zero(spark, sf_smoke, tmp_path):
    """Streaming the unchanged at-rest corpus back in is the null
    case: the vocabulary histogram matches the baseline exactly,
    PSI ~ 0 (smoothing keeps it nonzero but far below the 0.1
    investigate band)."""
    report_path, _ = _run(spark, sf_smoke, tmp_path, "ident", shift=False)
    rep = read_report(spark, report_path).collect()
    assert abs(rep[0].psi_total) < 0.01
    n = sum(r.curr_n for r in rep)
    assert n == sum(r.base_n for r in rep) and n > 0


def test_restart_converges_on_same_checkpoint(spark, sf_smoke, tmp_path):
    """Mid-run stop/restart on the same checkpoint: the complete-mode
    bucket state restores and the final report equals the batch
    answer."""
    src = str(tmp_path / "stream_restart")
    _write_stream_dir(spark, sf_smoke, src, shift=True)
    report_path = str(tmp_path / "report_restart")
    ckpt = str(tmp_path / "ckpt_restart")

    def start():
        stream = (
            spark.readStream.schema(_DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return td.maintain_text_drift(
            spark, sf_smoke, stream, report_path, checkpoint=ckpt
        )

    q = start()
    try:
        while len(q.recentProgress) < 1:
            q.awaitTermination(1)
    finally:
        q.stop()
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rep = read_report(spark, report_path).orderBy("bucket").collect()
    baseline = td.baseline_vocab_histogram(spark, sf_smoke)
    cur = td.streaming_vocab_histogram(spark.read.parquet(src))
    want = td.vocab_psi_report(spark, baseline, cur).orderBy(
        "bucket"
    ).collect()
    assert [tuple(r) for r in rep] == [tuple(r) for r in want]
