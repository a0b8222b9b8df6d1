"""Streaming Bloom maintenance (streaming/bloom.py): maintained bits
equal the batch filter, probes never false-negative a seen key.
Crash-replay / compaction / governance cells live in the shared
matrix (tests/test_maintained_stores.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sketches as sk
from customer_churn_prediction_spark.streaming import bloom as sbl



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
