"""Streaming GK maintenance (streaming/quantiles.py): the maintained
per-group percentiles honor the batch op's rank-error contract
against the exact percentiles of everything ingested. The
checkpointed-restart cell lives in the shared matrix
(tests/test_maintained_stores.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.operators.sketches import ACCURACY
from customer_churn_prediction_spark.streaming import quantiles as sq
from customer_churn_prediction_spark.streaming.drift import read_report

_EPS = 1.0 / ACCURACY


def _halves(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "events_src")
    for i in range(2):
        events.where(F.col("event_id") % 2 == i).repartition(
            1
        ).write.mode("append").parquet(src)
    return events, src


def _group_values(events):
    rows = (
        events.where(F.col("value").isNotNull())
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(float(r.value))
    return {k: sorted(v) for k, v in by_type.items()}


def _assert_report_in_band(report_rows, by_type, n_want):
    """The GK contract on ELEMENTS: the returned value's rank bracket
    must overlap [p - 2eps, p + 2eps] of the group. (An interpolated-
    percentile band is wrong for small groups — the sketch returns an
    actual element, whose value can legitimately exceed the
    interpolated p+2eps point when ranks are sparse.)"""
    assert sum(r["n_events"] for r in report_rows) == n_want
    for r in report_rows:
        vals = by_type[r["event_type"]]
        n = len(vals)
        assert r["n_events"] == n
        for p in sq.QUANTILE_PS:
            tag = f"p{int(p * 100)}"
            got = r[f"approx_{tag}"]
            below = sum(1 for v in vals if v < got)  # rank lower bound
            upto = sum(1 for v in vals if v <= got)  # rank upper bound
            lo_ok = upto / n >= p - 2 * _EPS
            hi_ok = below / n <= p + 2 * _EPS + 1.0 / n
            assert got in vals, (r["event_type"], tag, got)
            assert lo_ok and hi_ok, (
                r["event_type"], tag, got, below, upto, n,
            )


def test_maintained_quantiles_hold_batch_band(spark, sf_smoke, tmp_path):
    events, src = _halves(spark, sf_smoke, tmp_path)
    report = str(tmp_path / "report")
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = sq.maintain_quantiles(
        spark, stream, report, checkpoint=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    rows = [r.asDict() for r in read_report(spark, report).collect()]
    n_want = events.where(F.col("value").isNotNull()).count()
    _assert_report_in_band(rows, _group_values(events), n_want)
