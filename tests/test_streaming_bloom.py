"""Streaming Bloom maintenance (streaming/bloom.py): maintained bits
equal the batch filter, probes never false-negative a seen key,
exactly-once under an injected crash, compaction preserves the
filter."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sketches as sk
from customer_churn_prediction_spark.streaming import bloom as sbl

from .conftest import CrashOnce, drain_to_exception as _drain


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("key")
    )


def _run(spark, stream_dir, store, ckpt, fault=None):
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    return sbl.maintain_membership(
        spark, stream, store, checkpoint=ckpt, fault=fault
    )


def _bits(df):
    return sorted(r.bit for r in df.collect())


def test_maintained_bits_equal_batch_and_probe_answers(spark, tmp_path):
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    w1 = _keys(spark, 0, 300)
    w1.repartition(1).write.mode("append").parquet(stream_dir)
    q = _run(spark, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
        w2 = _keys(spark, 300, 600)
        w2.repartition(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    both = w1.unionByName(w2)
    assert _bits(sbl.merged_bits(spark, store)) == _bits(
        sk.bloom_bits(both)
    )
    # no false negatives: EVERY ingested key is flagged, including
    # wave-1 keys probed after wave 2 extended the filter
    flags = {
        r.key: r.flagged
        for r in sbl.probe_keys(spark, store, both).collect()
    }
    assert all(flags.values()) and len(flags) == 600
    # unseen keys flag only at the FPR — with 600*4 bits in 2^17 the
    # expected FPR is ~(2400/131072)^4 ~ 1e-7, so 0 of 500 here
    unseen = _keys(spark, 1_000_000, 1_000_500)
    hits = (
        sbl.probe_keys(spark, store, unseen)
        .where(F.col("flagged"))
        .count()
    )
    assert hits == 0


def test_replayed_epoch_does_not_corrupt_filter(spark, tmp_path):
    stream_dir = str(tmp_path / "arrivals_r")
    store = str(tmp_path / "store_r")
    ckpt = str(tmp_path / "ckpt_r")
    w1 = _keys(spark, 0, 200)
    w1.repartition(1).write.mode("append").parquet(stream_dir)
    w2 = _keys(spark, 200, 400)
    w2.repartition(1).write.mode("append").parquet(stream_dir)

    crash = CrashOnce(at_epoch=1)
    q = _run(spark, stream_dir, store, ckpt, fault=crash)
    assert _drain(q) is not None, "fault must abort the first run"
    assert crash.fired

    q2 = _run(spark, stream_dir, store, ckpt)
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
    finally:
        q2.stop()

    assert _bits(sbl.merged_bits(spark, store)) == _bits(
        sk.bloom_bits(w1.unionByName(w2))
    )


def test_compact_preserves_filter_and_is_idempotent(spark, tmp_path):
    stream_dir = str(tmp_path / "arrivals_c")
    store = str(tmp_path / "store_c")
    ckpt = str(tmp_path / "ckpt_c")
    for i in range(3):
        _keys(spark, 100 * i, 100 * (i + 1)).repartition(1).write.mode(
            "append"
        ).parquet(stream_dir)
    q = _run(spark, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    before = _bits(sbl.merged_bits(spark, store))
    sbl.compact(spark, store, upto_epoch=10)
    assert _bits(sbl.merged_bits(spark, store)) == before
    bits_path = os.path.join(store, sbl.BITS_SUBDIR)
    parts = [
        d for d in os.listdir(bits_path) if d.startswith("epoch_id=")
    ]
    assert parts == [f"epoch_id={sbl._BASE_EPOCH}"]
    sbl.compact(spark, store, upto_epoch=10)
    assert _bits(sbl.merged_bits(spark, store)) == before


def test_sketches_cannot_unlearn_rebuild_is_the_erasure_path(
    spark, tmp_path
):
    """Governance contract (module docstring): a lossy sketch cannot
    erase a key in place — a set bit may be shared, so the maintained
    filter keeps flagging an 'erased' key until the store is REBUILT
    from the scrubbed source; the rebuild stops flagging it without
    disturbing anyone else's no-false-negative guarantee."""
    stream_dir = str(tmp_path / "arrivals_g")
    store = str(tmp_path / "store_g")
    ckpt = str(tmp_path / "ckpt_g")
    keys = _keys(spark, 0, 300)
    keys.repartition(1).write.mode("append").parquet(stream_dir)
    q = _run(spark, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    victim = "42"
    # the filter has no delete: the erased key still flags (honest
    # over-approximation, not retained identity)
    assert (
        sbl.probe_keys(
            spark, store,
            spark.createDataFrame([(victim,)], "key string"),
        ).collect()[0].flagged
    )

    # rebuild from the scrubbed source = the erasure path
    clean = keys.where(F.col("key") != victim)
    stream2 = str(tmp_path / "arrivals_g2")
    store2 = str(tmp_path / "store_g2")
    clean.repartition(1).write.mode("append").parquet(stream2)
    q2 = _run(spark, stream2, store2, str(tmp_path / "ckpt_g2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    flags = {
        r.key: r.flagged
        for r in sbl.probe_keys(
            spark, store2, keys
        ).collect()
    }
    assert not flags[victim], "rebuilt filter must not flag erased key"
    others = [v for k, v in flags.items() if k != victim]
    assert all(others), "rebuild must keep everyone else's guarantee"
