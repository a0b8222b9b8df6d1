"""Streaming resample maintenance (streaming/resample.py): after the
events drain through the stream, the grid served from the maintained
store equals the batch ``events_resample_ffill`` row-for-row — across
epoch slicings and an injected crash replay — and the per-epoch
snapshot is each user's true current state. Crash-replay / compaction
/ governance / empty-read cells live in the shared matrix
(tests/test_maintained_stores.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.operators import asof
from customer_churn_prediction_spark.streaming import resample as srs

from .conftest import CrashOnce, drain_to_exception


def _stage_drops(spark, sf_smoke, stream_dir, n_waves=3):
    events = load_table(spark, sf_smoke, "events")
    for i in range(n_waves):
        events.where(F.col("event_id") % n_waves == i).repartition(
            1
        ).write.mode("append").parquet(stream_dir)
    return events


def _run(spark, sf_smoke, stream_dir, store, ckpt, fault=None):
    events = load_table(spark, sf_smoke, "events")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    return srs.maintain_resample(
        spark, stream, store, checkpoint=ckpt, fault=fault
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_store_serves_exact_batch_grid(spark, sf_smoke, tmp_path):
    """Epoch-union ≡ batch: the served grid equals the one-pass
    operator on the same events, gaps included."""
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    got = _rows(srs.resample_report(spark, store))
    want = _rows(asof.events_resample_ffill(spark, sf_smoke))
    assert got == want and len(got) > 0


def test_store_serves_exact_batch_grid_across_crash(
    spark, sf_smoke, tmp_path
):
    """The worst-case replay window (state + snapshot written, offset
    not committed) must not change the served grid: the replayed
    epoch overwrites its own partition."""
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ck")
    _stage_drops(spark, sf_smoke, stream_dir)

    q = _run(
        spark, sf_smoke, stream_dir, store, ckpt,
        fault=CrashOnce(at_epoch=1),
    )
    drain_to_exception(q)
    q2 = _run(spark, sf_smoke, stream_dir, store, ckpt)
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()

    got = _rows(srs.resample_report(spark, store))
    want = _rows(asof.events_resample_ffill(spark, sf_smoke))
    assert got == want and len(got) > 0


def test_snapshot_is_each_users_current_state(spark, sf_smoke, tmp_path):
    """The published per-user snapshot must hold the latest event's
    value (by ts, event_id), its hour, and the lifetime count —
    checked independently against the raw events."""
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    events = _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    want = _rows(
        events.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == 1,
                    F.date_format(
                        F.date_trunc("hour", F.col("ts")),
                        "yyyy-MM-dd HH:00:00",
                    ),
                )
            ).alias("last_hour"),
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias(
                "last_value"
            ),
            F.count(F.lit(1)).cast("long").alias("total_events"),
        )
        .select("user_id", "last_hour", "last_value", "total_events")
    )
    got = _rows(srs.snapshot(spark, store))
    assert got == want and len(got) > 0
