"""Embedding-drift maintenance (streaming/vector_drift.py): the
vector-modality drift report maintained over an arriving stream,
compared against the frozen at-rest corpus through the shared PSI
formula and the atomic _LATEST publish."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.streaming import vector_drift as vd
from customer_churn_prediction_spark.streaming.drift import read_report
from customer_churn_prediction_spark.streaming.vector_ingest import EMB_SCHEMA


def _write_stream_dir(spark, sf_dir, dst, shift: bool) -> None:
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    if shift:
        # the batch op's deterministic drift injection: the abs()
        # re-embedding (encoder-swap stand-in)
        e = e.withColumn(
            "embedding",
            F.expr("transform(embedding, x -> cast(abs(x) as float))"),
        )
    e.select("vec_id", "embedding", "label").repartition(2).write.mode(
        "overwrite"
    ).parquet(dst)


def _run(spark, sf_dir, tmp_path, tag: str, shift: bool):
    src = str(tmp_path / f"stream_{tag}")
    _write_stream_dir(spark, sf_dir, src, shift)
    stream = spark.readStream.schema(EMB_SCHEMA).parquet(src)
    report_path = str(tmp_path / f"report_{tag}")
    q = vd.maintain_embedding_drift(
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
    assert total > 0.1  # the injected shift clears the investigate band

    # batch equivalence: the same histogram pair through the batch
    # helper must produce the identical report
    baseline = vd.baseline_cell_histogram(spark, sf_smoke)
    cur = vd.streaming_cell_histogram(
        spark, sf_smoke, spark.read.parquet(src)
    )
    want = vd.cell_psi_report(spark, baseline, cur).orderBy(
        "bucket"
    ).collect()
    assert [tuple(r) for r in rep] == [tuple(r) for r in want]


def test_identity_stream_scores_near_zero(spark, sf_smoke, tmp_path):
    """Streaming the unchanged at-rest corpus back in is the null
    case: occupancy matches the baseline exactly, PSI ~ 0 (smoothing
    keeps it nonzero but far below the 0.1 band)."""
    report_path, _ = _run(spark, sf_smoke, tmp_path, "ident", shift=False)
    rep = read_report(spark, report_path).collect()
    assert abs(rep[0].psi_total) < 0.01
    # full population accounted on both sides
    n = sum(r.curr_n for r in rep)
    assert n == sum(r.base_n for r in rep) and n > 0


def test_restart_converges_on_same_checkpoint(spark, sf_smoke, tmp_path):
    """Mid-run stop/restart on the same checkpoint: the complete-mode
    cell state restores and the final report equals the batch answer
    (the sibling drift sink's restart contract, on the vector twin)."""
    src = str(tmp_path / "stream_restart")
    _write_stream_dir(spark, sf_smoke, src, shift=True)
    report_path = str(tmp_path / "report_restart")
    ckpt = str(tmp_path / "ckpt_restart")

    def start():
        stream = (
            spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return vd.maintain_embedding_drift(
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
    baseline = vd.baseline_cell_histogram(spark, sf_smoke)
    cur = vd.streaming_cell_histogram(
        spark, sf_smoke, spark.read.parquet(src)
    )
    want = vd.cell_psi_report(spark, baseline, cur).orderBy(
        "bucket"
    ).collect()
    assert [tuple(r) for r in rep] == [tuple(r) for r in want]
