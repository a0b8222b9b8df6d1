"""streaming/pairs.py — continuous training-pair generation.

Contract: with events delivered in (ts, event_id) order across
micro-batches, the union of emitted pairs equals the batch
``sequence_training_pairs`` exactly — each pair once, every batch
pair present — and the equality survives a stop/checkpoint-resume
in the middle of the stream."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from customer_churn_prediction_spark.catalog import load_table
from customer_churn_prediction_spark.operators import sampling
from customer_churn_prediction_spark.streaming import pairs as sp
from customer_churn_prediction_spark.streaming import windows as sw


def _ordered_slices(spark, sf_smoke, n_slices=3):
    """Stage events as n_slices parquet files, globally ordered by
    (ts, event_id): dropping them in index order delivers every
    user's events in batch-window order."""
    events = load_table(spark, sf_smoke, "events")
    w = Window.orderBy("ts", "event_id")
    ranked = events.withColumn("rn", F.row_number().over(w))
    total = ranked.count()
    per = (total + n_slices - 1) // n_slices
    slices = []
    for i in range(n_slices):
        slices.append(
            ranked.where(
                (F.col("rn") > i * per) & (F.col("rn") <= (i + 1) * per)
            ).drop("rn")
        )
    return events, slices


def _drop(slice_df, drop_dir, i):
    slice_df.coalesce(1).write.mode("append").parquet(drop_dir)


def _landed(spark, out_dir):
    return spark.read.parquet(out_dir).select(
        "user_id", "pos", "target_item", "context", "ctx_len"
    )


def _want(events):
    return sampling.sequence_pairs_frame(sp.project_purchases(events))


def test_stream_pairs_equal_batch_over_ordered_drops(
    spark, sf_smoke, tmp_path
):
    events, slices = _ordered_slices(spark, sf_smoke)
    drop_dir = tempfile.mkdtemp(prefix="pairs_drops_")
    out = str(tmp_path / "pairs_out")
    ckpt = str(tmp_path / "pairs_ckpt")
    try:
        _drop(slices[0], drop_dir, 0)
        stream = sw.as_stream(spark, drop_dir, events.schema)

        def land(df, epoch_id):
            df.write.mode("append").parquet(out)

        q = (
            sp.streaming_sequence_pairs(stream)
            .writeStream.foreachBatch(land)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .queryName("pairs_smoke")
            .start()
        )
        try:
            q.processAllAvailable()
            for i, s in enumerate(slices[1:], start=1):
                _drop(s, drop_dir, i)
                q.processAllAvailable()
            assert q.exception() is None
        finally:
            q.stop()
        got = sorted(map(tuple, _landed(spark, out).collect()))
        want = sorted(map(tuple, _want(events).collect()))
        assert len(got) == len(set(got))  # each pair exactly once
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(drop_dir, ignore_errors=True)


def _example_layout(pairs_df):
    """(context, target) -> the reference's Example layout: a fixed
    W_CTX-long float feature vector (left-padded with 0) + float
    label — the shape the tfrecord sink ships to a trainer."""
    ctx = F.expr("transform(split(context, '\\\\|'), x -> cast(x as float))")
    pad = F.array_repeat(
        F.lit(0.0).cast("float"), F.lit(sampling.W_CTX) - F.size(ctx)
    )
    return pairs_df.select(
        F.concat(pad, ctx).alias("features"),
        F.col("target_item").cast("float").alias("label"),
    )


def test_stream_pairs_export_to_tfrecord_shards(spark, sf_smoke, tmp_path):
    """The tier end-to-end: live pair generation feeding the
    continuous training-data export — stream pairs through the
    Example projection into the registered tfrecord stream sink, and
    the batch read-back must equal the batch pairs pushed through the
    same projection."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    events, slices = _ordered_slices(spark, sf_smoke)
    drop_dir = tempfile.mkdtemp(prefix="pairs_export_")
    out = str(tmp_path / "shards")
    ckpt = str(tmp_path / "ckpt")
    try:
        _drop(slices[0], drop_dir, 0)
        stream = sw.as_stream(spark, drop_dir, events.schema)
        q = (
            _example_layout(sp.streaming_sequence_pairs(stream))
            .writeStream.format("tfrecord")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .queryName("pairs_export")
            .start()
        )
        try:
            q.processAllAvailable()
            for i, s in enumerate(slices[1:], start=1):
                _drop(s, drop_dir, i)
                q.processAllAvailable()
            assert q.exception() is None
        finally:
            q.stop()
        got = sorted(
            (tuple(r.features), r.label)
            for r in spark.read.format("tfrecord").load(out).collect()
        )
        want = sorted(
            (tuple(r.features), r.label)
            for r in _example_layout(_want(events)).collect()
        )
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(drop_dir, ignore_errors=True)


def test_stream_pairs_survive_checkpoint_resume(spark, sf_smoke, tmp_path):
    """Stop the query between drops and resume from the checkpoint:
    per-user state (context window + position counter) must carry
    across the restart, so the union still equals batch with no
    duplicate or missing pairs."""
    events, slices = _ordered_slices(spark, sf_smoke)
    drop_dir = tempfile.mkdtemp(prefix="pairs_resume_")
    out = str(tmp_path / "pairs_out")
    ckpt = str(tmp_path / "pairs_ckpt")

    def land(df, epoch_id):
        df.write.mode("append").parquet(out)

    def run(name):
        stream = sw.as_stream(spark, drop_dir, events.schema)
        return (
            sp.streaming_sequence_pairs(stream)
            .writeStream.foreachBatch(land)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .queryName(name)
            .start()
        )

    try:
        _drop(slices[0], drop_dir, 0)
        q = run("pairs_resume_1")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        for i, s in enumerate(slices[1:], start=1):
            _drop(s, drop_dir, i)
        q = run("pairs_resume_2")
        try:
            q.processAllAvailable()
            assert q.exception() is None
        finally:
            q.stop()
        got = sorted(map(tuple, _landed(spark, out).collect()))
        want = sorted(map(tuple, _want(events).collect()))
        assert len(got) == len(set(got))
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(drop_dir, ignore_errors=True)
