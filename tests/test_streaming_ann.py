"""Streaming IVF maintenance (streaming/ann_ingest.py): after the
corpus drains through the stream, querying the maintained store
equals the batch ``ann_ivf`` exactly; a replayed epoch overwrites its
own partitions; offline compaction preserves the index and
self-heals; the store keeps the cell-partitioned layout queries
prune on."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.similarity import ann
from customer_churn_prediction_spark.streaming import ann_ingest as sai


class CrashOnce:
    def __init__(self, at_epoch: int):
        self.at_epoch = at_epoch
        self.fired = False

    def __call__(self, epoch_id: int) -> None:
        if epoch_id == self.at_epoch and not self.fired:
            self.fired = True
            raise RuntimeError(f"injected crash after epoch {epoch_id}")


def _drain(q):
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    return q.exception()


def _stage_drops(spark, sf_smoke, stream_dir, n_waves=3):
    emb = load_table(spark, sf_smoke, "embeddings")
    total = emb.count()
    per = (total + n_waves - 1) // n_waves
    for i in range(n_waves):
        emb.where(
            (F.col("vec_id") >= i * per) & (F.col("vec_id") < (i + 1) * per)
        ).repartition(1).write.mode("append").parquet(stream_dir)
    return emb


def _run(spark, sf_smoke, stream_dir, store, ckpt, fault=None):
    stream = (
        spark.readStream.schema(
            "vec_id bigint, embedding array<float>, label int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    return sai.maintain_ivf_lists(
        spark, sf_smoke, stream, store, checkpoint=ckpt, fault=fault
    )


def _topk_rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, r.cosine_sim, r.rank)
        for r in df.collect()
    )


def test_maintained_store_serves_exact_batch_ivf(spark, sf_smoke, tmp_path):
    stream_dir = str(tmp_path / "arrivals")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    got = _topk_rows(sai.ivf_topk_from_store(spark, sf_smoke, store))
    want = _topk_rows(ann.ann_ivf(spark, sf_smoke))
    assert got == want and len(got) > 0
    # every ingested vector is indexed exactly once
    n_corpus = load_table(spark, sf_smoke, "embeddings").count()
    assert spark.read.parquet(store).count() == n_corpus
    # and the layout queries prune on is present: cell dirs per epoch
    epochs = [d for d in os.listdir(store) if d.startswith("epoch_id=")]
    assert len(epochs) >= 2  # one per non-empty wave
    cells = os.listdir(os.path.join(store, epochs[0]))
    assert any(c.startswith("centroid_id=") for c in cells)


def test_replayed_epoch_overwrites_its_own_partitions(
    spark, sf_smoke, tmp_path
):
    """Crash AFTER the store write, BEFORE the offset commit: the
    replayed epoch must overwrite its own (epoch, cell) partitions —
    no duplicate vectors, and the served top-k still equals batch."""
    stream_dir = str(tmp_path / "arrivals_r")
    store = str(tmp_path / "store_r")
    ckpt = str(tmp_path / "ckpt_r")
    _stage_drops(spark, sf_smoke, stream_dir)

    crash = CrashOnce(at_epoch=1)
    q = _run(spark, sf_smoke, stream_dir, store, ckpt, fault=crash)
    assert _drain(q) is not None, "fault must abort the first run"
    assert crash.fired

    q2 = _run(spark, sf_smoke, stream_dir, store, ckpt)
    try:
        q2.processAllAvailable()
        assert q2.exception() is None, "recovery run must drain cleanly"
    finally:
        q2.stop()

    stored = spark.read.parquet(store)
    n_corpus = load_table(spark, sf_smoke, "embeddings").count()
    assert stored.count() == n_corpus
    assert stored.select("vec_id").distinct().count() == n_corpus
    assert _topk_rows(
        sai.ivf_topk_from_store(spark, sf_smoke, store)
    ) == _topk_rows(ann.ann_ivf(spark, sf_smoke))


def test_compact_preserves_index_and_is_idempotent(
    spark, sf_smoke, tmp_path
):
    stream_dir = str(tmp_path / "arrivals_c")
    store = str(tmp_path / "store_c")
    ckpt = str(tmp_path / "ckpt_c")
    _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    before = _topk_rows(sai.ivf_topk_from_store(spark, sf_smoke, store))
    sai.compact(spark, store, upto_epoch=10)
    assert _topk_rows(
        sai.ivf_topk_from_store(spark, sf_smoke, store)
    ) == before
    epochs = [d for d in os.listdir(store) if d.startswith("epoch_id=")]
    assert epochs == [f"epoch_id={sai._BASE_EPOCH}"]
    # the cell sub-partitioning survives the fold
    cells = os.listdir(os.path.join(store, epochs[0]))
    assert any(c.startswith("centroid_id=") for c in cells)
    # idempotent re-run
    sai.compact(spark, store, upto_epoch=10)
    assert _topk_rows(
        sai.ivf_topk_from_store(spark, sf_smoke, store)
    ) == before


def test_compact_heals_a_crashed_swap(spark, sf_smoke, tmp_path):
    """Entry-time self-heal: old-without-live -> rename back, stale
    stage -> delete — a compaction killed between its renames must
    leave the next run with the full index."""
    stream_dir = str(tmp_path / "arrivals_h")
    store = str(tmp_path / "store_h")
    ckpt = str(tmp_path / "ckpt_h")
    _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = _topk_rows(sai.ivf_topk_from_store(spark, sf_smoke, store))

    # simulate the worst window: live renamed to old, stage missing
    os.rename(store, store + "__compact_old")
    sai.compact(spark, store, upto_epoch=10)
    assert _topk_rows(
        sai.ivf_topk_from_store(spark, sf_smoke, store)
    ) == want
