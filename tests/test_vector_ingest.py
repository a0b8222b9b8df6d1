"""Vector-index-on-ingest (streaming/vector_ingest.py): the streamed
store equals the batch-built index regardless of epoch slicing, a
mid-epoch crash replays idempotently, and probes stay cell-pruned
across epochs."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.similarity import pq
from customer_churn_prediction_spark.streaming import vector_ingest


def _run(spark, sf_dir, tmp_path, n_files, fault=None, tag=""):
    src = str(tmp_path / f"vec_src{tag}")
    out = str(tmp_path / f"vec_store{tag}")
    ckpt = str(tmp_path / f"vec_ckpt{tag}")
    load_table(spark, sf_dir, "embeddings").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(src)
    q = vector_ingest.vector_ingest_stream(
        spark, sf_dir, src, out, ckpt,
        max_files_per_trigger=1, fault=fault,
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    shutil.rmtree(src, ignore_errors=True)
    return out, ckpt


def _batch_codes(spark, sf_dir):
    return pq.ivf_pq_store_ingest(spark, sf_dir).select(
        "vec_id", *[f"code{m}" for m in range(pq.PQ_M)], "centroid_id"
    )


def test_streamed_store_equals_batch_index_any_slicing(spark, sf_dir, tmp_path):
    out, _ = _run(spark, sf_dir, tmp_path, n_files=3)
    got = spark.read.parquet(out).drop("epoch_id")
    want = _batch_codes(spark, sf_dir)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_crash_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Crash after the epoch-1 write but before its offset commit: the
    restart re-delivers that epoch; its partition overwrite must leave
    the store equal to the batch index, not duplicated."""
    crashed = {"done": False}

    def fault(epoch_id):
        if epoch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before offset commit")

    src = str(tmp_path / "vec_src_crash")
    out = str(tmp_path / "vec_store_crash")
    ckpt = str(tmp_path / "vec_ckpt_crash")
    load_table(spark, sf_dir, "embeddings").repartition(3).write.mode(
        "overwrite"
    ).parquet(src)

    def start():
        return vector_ingest.vector_ingest_stream(
            spark, sf_dir, src, out, ckpt,
            max_files_per_trigger=1, fault=fault,
        )

    q = start()
    with pytest.raises(Exception):
        q.awaitTermination()
    q2 = start()
    try:
        assert q2.awaitTermination(300)
    finally:
        q2.stop()
    got = spark.read.parquet(out).drop("epoch_id")
    want = _batch_codes(spark, sf_dir)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_probe_scan_prunes_cells_across_epochs(spark, sf_dir, tmp_path):
    """Partition pruning on centroid_id must survive the extra
    epoch_id partition level: a 2-cell probe reads only those cells'
    files in the EXECUTED scan."""
    from customer_churn_prediction_spark.sources.layout import scan_metrics

    out, _ = _run(spark, sf_dir, tmp_path, n_files=3, tag="_probe")
    store = spark.read.parquet(out)
    cells = [
        r.centroid_id
        for r in store.select("centroid_id").distinct().limit(2).collect()
    ]
    probe = store.where(F.col("centroid_id").isin(cells))
    m = scan_metrics(probe)
    all_m = scan_metrics(spark.read.parquet(out))
    assert 0 < m["numFiles"] < all_m["numFiles"]
    assert m["numOutputRows"] == store.where(
        F.col("centroid_id").isin(cells)
    ).count()
