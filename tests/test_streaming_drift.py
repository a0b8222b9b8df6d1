"""Maintained streaming PSI (streaming/drift.py): the continuously
overwritten report must equal the batch computation on the same data,
including across multi-epoch runs and a checkpointed restart."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.streaming import drift

from .oracle_utils import canonical_rows


def _events_src(spark, sf_smoke, tmp_path, n_files=1):
    src = str(tmp_path / "events_src")
    e = load_table(spark, sf_smoke, "events")
    e.repartition(n_files).write.mode("overwrite").parquet(src)
    return src, e.schema


def _batch_report(spark, sf_smoke, src):
    current = (
        spark.read.parquet(src)
        .select(drift._bucket("value").alias("bucket"))
        .groupBy("bucket")
        .count()
    )
    return drift.psi_report(
        spark, drift.baseline_histogram(spark, sf_smoke), current
    )


def test_final_report_equals_batch(spark, sf_smoke, tmp_path):
    src, schema = _events_src(spark, sf_smoke, tmp_path)
    report = str(tmp_path / "report")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        q = drift.maintain_drift_psi(
            spark,
            stream,
            drift.baseline_histogram(spark, sf_smoke),
            report,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = drift.read_report(spark, report)
        want = _batch_report(spark, sf_smoke, src)
        assert canonical_rows(got.toPandas()) == canonical_rows(
            want.toPandas()
        )
        totals = {r.psi_total for r in got.collect()}
        assert len(totals) == 1
        assert totals.pop() >= 0.0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_multi_epoch_restart_converges(spark, sf_smoke, tmp_path):
    """Three single-file epochs with a mid-run stop/restart on the
    same checkpoint: the complete-mode state restores and the final
    report equals the batch answer (epoch replay is idempotent because
    the report is a pure function of the running histogram)."""
    src, schema = _events_src(spark, sf_smoke, tmp_path, n_files=3)
    report = str(tmp_path / "report")
    ckpt = str(tmp_path / "ckpt")
    baseline = drift.baseline_histogram(spark, sf_smoke)

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return drift.maintain_drift_psi(
            spark, stream, baseline, report, checkpoint=ckpt
        )

    try:
        q = start()
        try:
            # let at least one epoch commit, then kill mid-run
            while len(q.recentProgress) < 1:
                q.awaitTermination(1)
        finally:
            q.stop()
        q2 = start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        got = drift.read_report(spark, report)
        want = _batch_report(spark, sf_smoke, src)
        assert canonical_rows(got.toPandas()) == canonical_rows(
            want.toPandas()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
