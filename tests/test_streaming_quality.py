"""Maintained streaming DQ report (streaming/quality.py): final report
equals the batch rule counts, dirty rows are flagged within the run,
and a checkpointed restart converges — the drift-sink contract applied
to the rule monitor."""

from __future__ import annotations

import datetime as dt
import shutil

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.streaming import quality as squality

from .oracle_utils import canonical_rows


def _events_src(spark, sf_smoke, tmp_path, n_files=1):
    src = str(tmp_path / "events_src")
    e = load_table(spark, sf_smoke, "events")
    e.repartition(n_files).write.mode("overwrite").parquet(src)
    return src, e.schema


def _batch_report(spark, src):
    return squality.rule_report(
        squality.streaming_rule_counts(spark.read.parquet(src))
    )


def test_final_report_equals_batch_and_is_clean(spark, sf_smoke, tmp_path):
    src, schema = _events_src(spark, sf_smoke, tmp_path)
    report = str(tmp_path / "report")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        q = squality.maintain_dq_report(spark, stream, report)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = squality.read_report(spark, report)
        want = _batch_report(spark, src)
        assert canonical_rows(got.toPandas()) == canonical_rows(
            want.toPandas()
        )
        rows = {r.check: r for r in got.collect()}
        assert set(rows) == set(squality._RULES)
        assert all(r.passed == 1 for r in rows.values())
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_dirty_rows_flagged_and_restart_converges(spark, sf_smoke, tmp_path):
    """Dirty rows in a later epoch flip their rules to failing; a
    checkpointed stop/restart mid-run still converges to the batch
    answer."""
    src = str(tmp_path / "events_src2")
    e = load_table(spark, sf_smoke, "events")
    dirty = spark.createDataFrame(
        [
            (900_001, dt.datetime(2024, 1, 2), 1, "bogus_type", 1.0, "{}"),
            (900_002, dt.datetime(2024, 1, 2), 2, "click", -4.0, "{}"),
        ],
        e.schema,
    )
    e.unionByName(dirty).repartition(3).write.mode("overwrite").parquet(src)
    report = str(tmp_path / "report2")
    ckpt = str(tmp_path / "ckpt2")

    def start():
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return squality.maintain_dq_report(
            spark, stream, report, checkpoint=ckpt
        )

    try:
        q = start()
        try:
            # let at least one epoch publish, then stop mid-run
            q.processAllAvailable()
        finally:
            q.stop()
        q2 = start()
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        got = {r.check: r for r in squality.read_report(spark, report).collect()}
        assert got["event_type_in_domain"].n_violations == 1
        assert got["event_type_in_domain"].passed == 0
        assert got["value_non_negative"].n_violations == 1
        assert got["value_non_negative"].passed == 0
        assert got["ts_not_null"].passed == 1
        assert got["user_id_not_null"].passed == 1
        want = _batch_report(spark, src)
        assert canonical_rows(
            squality.read_report(spark, report).toPandas()
        ) == canonical_rows(want.toPandas())
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_empty_stream_epoch_publishes_typed_zeros(spark):
    """Zero rows so far must publish n_violations=0 / passed=1 per
    rule, never NULLs (sum over no rows is NULL without the
    coalesce)."""
    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    rows = squality.rule_report(
        squality.streaming_rule_counts(empty)
    ).collect()
    assert len(rows) == len(squality._RULES)
    for r in rows:
        assert r.n_violations == 0
        assert r.n_rows == 0
        assert r.passed == 1
