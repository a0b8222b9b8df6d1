"""Streaming IVF maintenance (streaming/ann_ingest.py): after the
corpus drains through the stream, querying the maintained store
equals the batch ``ann_ivf`` exactly; the store keeps the
cell-partitioned layout queries prune on; erasure is
partition-scoped with a WAL scrub. Crash-replay / compaction /
governance cells live in the shared matrix
(tests/test_maintained_stores.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.similarity import ann
from customer_churn_prediction_spark.streaming import ann_ingest as sai



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


def _files_snapshot(root):
    snap = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            snap[p] = (st.st_mtime_ns, st.st_size)
    return snap


def test_forget_is_partition_scoped_and_query_visible(
    spark, sf_smoke, tmp_path
):
    """Erasure from the maintained store: the ids disappear from the
    store and from served top-k, ONLY the partitions that contained
    them are rewritten (every other cell's files byte-untouched), and
    the batch is ledgered."""
    stream_dir = str(tmp_path / "arrivals_f")
    store = str(tmp_path / "store_f")
    ckpt = str(tmp_path / "ckpt_f")
    _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # pick two indexed vectors that are ANSWERS for some query
    served = sai.ivf_topk_from_store(spark, sf_smoke, store)
    victims = sorted(
        {int(r.neighbor_id) for r in served.collect()}
    )[:2]
    pre = spark.read.parquet(store)
    n_store_before = pre.count()
    # the victims' actual (epoch, cell) partitions, captured BEFORE
    # erasure — the exact set forget_from_store may rewrite
    victim_cells = {
        (int(r.epoch_id), int(r.centroid_id))
        for r in pre.where(
            F.col("vec_id").isin(victims)
        ).select("epoch_id", "centroid_id").distinct().collect()
    }
    before = _files_snapshot(store)

    touched, b, a = sai.forget_from_store(spark, store, victims)
    # counts are touched-partition scoped: their delta is the erasure
    assert touched == len(victim_cells)
    assert b - a == len(victims)
    assert (
        spark.read.parquet(store).count()
        == n_store_before - len(victims)
    )
    stored_ids = {
        int(r.vec_id)
        for r in spark.read.parquet(store).select("vec_id").collect()
    }
    assert not set(victims) & stored_ids
    survivors_topk = sai.ivf_topk_from_store(spark, sf_smoke, store)
    assert not {
        int(r.neighbor_id) for r in survivors_topk.collect()
    } & set(victims)
    # partition-scoped: every changed/removed data file lies inside a
    # victim cell's directory — everything else is byte-identical
    after = _files_snapshot(store)
    victim_dirs = [
        os.path.join(store, f"epoch_id={e}", f"centroid_id={c}")
        for e, c in victim_cells
    ]

    def _in_victim_cell(path):
        return any(path.startswith(d + os.sep) for d in victim_dirs)

    changed = [
        p for p in set(before) | set(after)
        if before.get(p) != after.get(p)
    ]
    data_changed = [p for p in changed if not p.endswith("_SUCCESS")]
    assert data_changed, "erasure must rewrite the victims' files"
    outside = [p for p in data_changed if not _in_victim_cell(p)]
    assert not outside, outside
    # and the ledger carries the batch
    ledger = {
        int(r.vec_id)
        for r in sai.read_erased_ids(spark, store).collect()
    }
    assert set(victims) <= ledger


def test_scrub_reapplies_ledger_after_a_replay_resurrection(
    spark, sf_smoke, tmp_path
):
    """A replayed epoch re-delivers its vectors, resurrecting erased
    ids — scrub_store must re-erase them from the WAL ledger, and a
    second scrub is a no-op."""
    stream_dir = str(tmp_path / "arrivals_s")
    store = str(tmp_path / "store_s")
    ckpt = str(tmp_path / "ckpt_s")
    _stage_drops(spark, sf_smoke, stream_dir)
    q = _run(spark, sf_smoke, stream_dir, store, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    victim = int(
        spark.read.parquet(store).select("vec_id").first().vec_id
    )
    sai.forget_from_store(spark, store, [victim])

    # simulate the replay: the victim's epoch partition rewritten from
    # the pre-erasure batch (dynamic overwrite of its own output)
    emb = load_table(spark, sf_smoke, "embeddings")
    resurrection = sai._assign(
        emb.where(F.col("vec_id") == victim),
        __import__(
            "customer_churn_prediction_spark.similarity.ann",
            fromlist=["_centroids"],
        )._centroids(spark, sf_smoke),
    ).withColumn("epoch_id", F.lit(0))
    (
        resurrection.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id", "centroid_id")
        .parquet(store)
    )
    assert spark.read.parquet(store).where(
        F.col("vec_id") == victim
    ).count() == 1

    removed = sai.scrub_store(spark, store)
    assert removed == 1
    assert spark.read.parquet(store).where(
        F.col("vec_id") == victim
    ).count() == 0
    assert sai.scrub_store(spark, store) == 0  # idempotent
