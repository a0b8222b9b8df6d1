"""Streaming CMS maintenance (streaming/sketch.py): mergeability
through the engine — per-epoch partials sum to exactly the batch
sketch, exactly-once under an injected crash, candidate top-K tracks
an injected hot key, and offline compaction preserves the sketch. Crash-replay / compaction / governance
cells live in the shared matrix (tests/test_maintained_stores.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.operators import sketches
from customer_churn_prediction_spark.streaming import sketch as ssk



def _events(spark, n, key_mod, hot_key=None, hot_n=0, id0=0):
    base = spark.range(id0, id0 + n).select(
        (F.col("id") % key_mod).alias("user_id")
    )
    if hot_n:
        base = base.unionByName(
            spark.range(hot_n).select(
                F.lit(hot_key).cast("bigint").alias("user_id")
            )
        )
    return base


def _batch_sketch(df):
    return (
        df.select(
            ssk._cms_cells(F.col("user_id")).alias("cell")
        )
        .select("cell.h", "cell.b")
        .groupBy("h", "b")
        .agg(F.count("*").alias("cell_cnt"))
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _run(spark, stream_dir, store, ckpt, fault=None):
    stream = (
        spark.readStream.schema("user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    return ssk.maintain_heavy_hitters(
        spark, stream, store, k=5, checkpoint=ckpt, fault=fault
    )


def test_maintained_sketch_equals_batch_and_tracks_hot_key(
    spark, tmp_path
):
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    wave1 = _events(spark, 300, 50, hot_key=9_999, hot_n=100)
    wave1.repartition(1).write.mode("append").parquet(stream_dir)
    q = _run(spark, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
        # second drop: hot key keeps appearing (the tracking contract)
        wave2 = _events(
            spark, 300, 50, hot_key=9_999, hot_n=80, id0=300
        )
        wave2.repartition(1).write.mode("append").parquet(stream_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    all_events = wave1.unionByName(wave2)
    assert _rows(ssk.merged_sketch(spark, store)) == _rows(
        _batch_sketch(all_events)
    )

    # the published report: hot key leads, estimate never undercounts
    rep = ssk_read_latest(spark, store)
    top = rep.orderBy(F.desc("est"), F.asc("key")).collect()
    assert top[0].key == 9_999
    assert top[0].est >= 180
    # point query agrees with the batch-probe arithmetic
    est = ssk.estimate_keys(
        spark, store, spark.createDataFrame([(9_999,)], "key bigint")
    ).collect()[0]
    assert est.est >= 180


def ssk_read_latest(spark, store):
    from customer_churn_prediction_spark.streaming.drift import (
        read_report,
    )

    return read_report(
        spark, os.path.join(store, ssk.REPORT_SUBDIR)
    )


def test_point_query_prices_unseen_and_partially_empty_keys(
    spark, tmp_path
):
    """CMS point-query contract (review r7): the estimate is the min
    over ALL d cells, counting a never-incremented cell as ZERO — an
    unseen key must appear in the output with est 0, not vanish
    through an inner join (and a key with some empty cells must not
    have its min inflated by minimizing over populated cells only)."""
    store = str(tmp_path / "store_pointq")
    seen = spark.createDataFrame([(42,)], "key bigint")
    ssk._partial_sketch(seen).write.parquet(
        os.path.join(store, ssk.SKETCH_SUBDIR, "epoch=0")
    )
    est = {
        r.key: r.est
        for r in ssk.estimate_keys(
            spark,
            store,
            spark.createDataFrame([(42,), (777,)], "key bigint"),
        ).collect()
    }
    assert est[42] == 1
    # 777 shares no cell with 42 under the fixed md5 cell hashes, so
    # all four of its cells are empty — the probe must price it 0.
    assert est[777] == 0
