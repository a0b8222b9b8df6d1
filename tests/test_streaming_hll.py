"""Streaming HLL maintenance (streaming/hll.py): per-epoch partial
registers merge to exactly the batch registers, the estimate from the
maintained store equals the batch estimator, exactly-once under an
injected crash, and compaction preserves the registers. Crash-replay / compaction / governance
cells live in the shared matrix (tests/test_maintained_stores.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sketches as sk
from customer_churn_prediction_spark.streaming import hll as shll



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
