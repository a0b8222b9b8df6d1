"""Streaming HLL maintenance (streaming/hll.py): per-epoch partial
registers merge to exactly the batch registers, the estimate from the
maintained store equals the batch estimator, exactly-once under an
injected crash, and compaction preserves the registers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sketches as sk
from customer_churn_prediction_spark.streaming import hll as shll

from .conftest import CrashOnce, drain_to_exception as _drain


def _events(spark, n, key_mod, id0=0):
    return spark.range(id0, id0 + n).select(
        (F.col("id") % key_mod).alias("user_id")
    )


def _run(spark, stream_dir, store, ckpt, fault=None):
    stream = (
        spark.readStream.schema("user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    return shll.maintain_distinct_count(
        spark, stream, store, checkpoint=ckpt, fault=fault
    )


def _regs_rows(df):
    return sorted((r.bucket, r.max_rho) for r in df.collect())


def _batch_regs(df):
    return sk.hll_registers(df.select(F.col("user_id").alias("key")))


def test_maintained_registers_equal_batch_and_estimate_agrees(
    spark, tmp_path
):
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    w1 = _events(spark, 400, 120)
    w1.repartition(1).write.mode("append").parquet(stream_dir)
    q = _run(spark, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
        w2 = _events(spark, 400, 300, id0=400)
        w2.repartition(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    both = w1.unionByName(w2)
    assert _regs_rows(shll.merged_registers(spark, store)) == _regs_rows(
        _batch_regs(both)
    )
    got = shll.estimate(spark, store).collect()[0].est
    want = sk.hll_estimate_expr(_batch_regs(both)).collect()[0].est
    assert got == want
    # and the estimator is actually informative on this data
    n_exact = both.distinct().count()
    assert abs(got - n_exact) <= sk.HLL_BAND * n_exact
    # published per-epoch report exists
    from customer_churn_prediction_spark.streaming.drift import (
        read_report,
    )

    rep = read_report(spark, os.path.join(store, shll.REPORT_SUBDIR))
    assert rep.count() == 1 and rep.collect()[0].est == want


def test_replayed_epoch_does_not_corrupt_registers(spark, tmp_path):
    stream_dir = str(tmp_path / "arrivals_r")
    store = str(tmp_path / "store_r")
    ckpt = str(tmp_path / "ckpt_r")
    w1 = _events(spark, 300, 90)
    w1.repartition(1).write.mode("append").parquet(stream_dir)
    w2 = _events(spark, 300, 90, id0=300)
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

    assert _regs_rows(shll.merged_registers(spark, store)) == _regs_rows(
        _batch_regs(w1.unionByName(w2))
    )


def test_compact_preserves_registers_and_is_idempotent(spark, tmp_path):
    stream_dir = str(tmp_path / "arrivals_c")
    store = str(tmp_path / "store_c")
    ckpt = str(tmp_path / "ckpt_c")
    for i in range(3):
        _events(spark, 150, 60, id0=150 * i).repartition(1).write.mode(
            "append"
        ).parquet(stream_dir)
    q = _run(spark, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    before = _regs_rows(shll.merged_registers(spark, store))
    shll.compact(spark, store, upto_epoch=10)
    assert _regs_rows(shll.merged_registers(spark, store)) == before
    regs_path = os.path.join(store, shll.REGS_SUBDIR)
    parts = [
        d for d in os.listdir(regs_path) if d.startswith("epoch_id=")
    ]
    assert parts == [f"epoch_id={shll._BASE_EPOCH}"]
    shll.compact(spark, store, upto_epoch=10)
    assert _regs_rows(shll.merged_registers(spark, store)) == before
