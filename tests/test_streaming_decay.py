"""Streaming decayed counters (streaming/decay.py): the maintained
features track the batch ``user_decay_features`` inside the documented
rounding band, the replayed history is BIT-identical to a clean run
over the same slicing, and the serving view matches the batch schema.
Crash-replay / compaction / governance / empty-read contract cells
live in the shared matrix (tests/test_maintained_stores.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.operators import decay
from customer_churn_prediction_spark.streaming import decay as sdc

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
    return sdc.maintain_decay(
        spark, stream, store, checkpoint=ckpt, fault=fault
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_features_track_batch_inside_band(spark, sf_smoke, tmp_path):
    """|maintained − batch| ≤ 1e-6·n_events·(1+|value|max) per user;
    integer columns and the anchor-age exact. The band is the honest
    contract: the stream rounds per-event weights at its epoch's
    anchor and rescales exactly, the batch rounds at the final
    anchor."""
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    events = _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    got = {r.user_id: r for r in sdc.features(spark, store).collect()}
    want = {
        r.user_id: r
        for r in decay.user_decay_features(
            spark, sf_smoke
        ).collect()
    }
    assert set(got) == set(want) and got
    vmax = events.agg(F.max(F.abs("value"))).collect()[0][0]
    for uid, w in want.items():
        g = got[uid]
        assert g.n_events == w.n_events
        assert g.last_event_age_days == w.last_event_age_days
        tol = 1e-6 * w.n_events + 1e-9
        assert abs(g.decayed_count - w.decayed_count) <= tol, (g, w)
        assert abs(g.decayed_value - w.decayed_value) <= tol * (
            1.0 + vmax
        ), (g, w)


def test_replay_is_bit_identical_to_clean_run(spark, sf_smoke, tmp_path):
    """Same slicing, one run crashed after epoch 1's write and
    resumed: the final snapshot must equal the never-crashed run's
    byte-for-byte — the replayed epoch rebuilds from the same
    predecessor snapshot and overwrites its own partition."""
    a_stream = str(tmp_path / "a_arrivals")
    a_store = str(tmp_path / "a_store")
    b_stream = str(tmp_path / "b_arrivals")
    b_store = str(tmp_path / "b_store")
    _stage_drops(spark, sf_smoke, a_stream)
    _stage_drops(spark, sf_smoke, b_stream)

    q = _run(spark, sf_smoke, a_stream, a_store,
             str(tmp_path / "a_ck"))
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    q1 = _run(
        spark, sf_smoke, b_stream, b_store, str(tmp_path / "b_ck"),
        fault=CrashOnce(at_epoch=1),
    )
    drain_to_exception(q1)
    q2 = _run(spark, sf_smoke, b_stream, b_store,
              str(tmp_path / "b_ck"))
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()

    assert _rows(sdc.latest_state(spark, a_store)) == _rows(
        sdc.latest_state(spark, b_store)
    )


def test_rescale_is_the_decay_identity(spark, sf_dir, tmp_path):
    """On a constructed history whose anchor advances by EXACTLY one
    half-life, a user with no new events must end with dc and dv at
    exactly half their first-snapshot values (binary halving is exact)
    and an unchanged event count — the rescale-and-add algebra with
    nothing re-rounded."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    stream_dir = str(tmp_path / "arrivals")
    import os

    os.makedirs(stream_dir)

    def drop(name, rows):
        pa_pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(
                        [r[0] for r in rows], pa.int64()
                    ),
                    "ts": pa.array(
                        [r[2] for r in rows], pa.timestamp("us")
                    ),
                    "user_id": pa.array(
                        [r[1] for r in rows], pa.int64()
                    ),
                    "event_type": pa.array(["click"] * len(rows)),
                    "value": pa.array(
                        [r[3] for r in rows], pa.float64()
                    ),
                    "props": pa.array(["{}"] * len(rows)),
                }
            ),
            os.path.join(stream_dir, name),
        )

    week = datetime.timedelta(days=decay.HALF_LIFE_DAYS)
    hour = datetime.timedelta(hours=1)
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ck")

    drop("0.parquet", [
        (0, 1, t0 - week, 10.0),
        (1, 1, t0 - week - hour, 20.0),
        (2, 2, t0 - week, 8.0),
    ])
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = sdc.maintain_decay(spark, stream, store, checkpoint=ckpt)
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    # state_at_anchor, not raw latest_state: under r11 delta writes a
    # user untouched by later epochs keeps an old row; the halving
    # appears at read via the exact lazy rescale (after epoch 0 the
    # factor is exactly 0.5^0 = 1, so `first` equals the raw rows).
    first = {
        r.user_id: r
        for r in sdc.state_at_anchor(spark, store).collect()
    }

    drop("1.parquet", [(3, 2, t0, 6.0)])
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q2 = sdc.maintain_decay(spark, stream2, store, checkpoint=ckpt)
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()
    final = {
        r.user_id: r
        for r in sdc.state_at_anchor(spark, store).collect()
    }

    # user 1 had no epoch-1 events: their STORED row is untouched
    # (delta-write contract), and the exactly-one-half-life rescale
    # to the new global anchor happens lazily at read
    f0, f1 = first[1], final[1]
    assert f1.dc == f0.dc * 0.5 and f1.dv == f0.dv * 0.5
    assert f1.n_events == f0.n_events == 2
    assert final[2].n_events == 2
    assert final[2].anchor == t0
    # and the delta-write claim itself: epoch 1 stored ONLY user 2
    raw = {
        r.user_id: r for r in sdc.latest_state(spark, store).collect()
    }
    assert raw[1].anchor == t0 - week  # never rewritten
    assert raw[2].anchor == t0
