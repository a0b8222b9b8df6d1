"""TFRecord codec + Spark sink/source (sources/tfrecord.py).

Covers the three layers separately: the CRC-32C/framing bytes (known
test vector, corruption detection), the minimal tf.train.Example proto
codec (round-trip incl. negative int64 and empty vectors), and the
Spark mapInPandas sink/source pair (round-trip equality against the
original DataFrame, reference libsvm parity)."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from customer_churn_prediction_spark.sources import tfrecord as tfr


def test_crc32c_known_vector():
    # The canonical CRC-32C check value (RFC 3720 appendix B / crc32c libs)
    assert tfr.crc32c(b"123456789") == 0xE3069283
    assert tfr.crc32c(b"") == 0


def test_varint_roundtrip_edges():
    for n in [0, 1, 127, 128, 300, 2**32, 2**63 - 1, 2**64 - 1]:
        buf = tfr._varint(n)
        val, pos = tfr._read_varint(buf, 0)
        assert (val, pos) == (n, len(buf))


def test_example_roundtrip_all_kinds():
    ex = {
        "feature": struct.pack("<4f", 1.0, 0.0, -2.5, 3.25),
        "label": [1.0],
        "ids": [7, -3, 2**40],
        "name": b"alice",
    }
    out = tfr.decode_example(tfr.encode_example(ex))
    assert out["feature"] == ex["feature"]
    assert out["label"] == [1.0]
    assert out["ids"] == [7, -3, 2**40]
    assert out["name"] == b"alice"


def test_example_encoding_is_deterministic_sorted_keys():
    a = tfr.encode_example({"b": [1], "a": [2]})
    b = tfr.encode_example({"a": [2], "b": [1]})
    assert a == b


def test_framing_roundtrip_and_corruption():
    recs = [b"alpha", b"", b"x" * 1000]
    blob = b"".join(tfr.frame_record(r) for r in recs)
    assert list(tfr.unframe_records(blob)) == recs
    corrupt = blob[:20] + bytes([blob[20] ^ 0xFF]) + blob[21:]
    with pytest.raises(ValueError, match="crc"):
        list(tfr.unframe_records(corrupt))


def test_spark_roundtrip(spark, tmp_path):
    df = spark.range(0, 97).select(
        F.col("id"),
        F.array(
            (F.col("id") * 0.5).cast("float"),
            (F.col("id") % 7).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("features"),
        (F.col("id") % 2).cast("float").alias("label"),
    ).repartition(4)
    out = str(tmp_path / "tfr")
    manifest = tfr.write_tfrecord(df, out, "features", "label")
    rows = manifest.collect()
    assert sum(r.n_records for r in rows) == 97
    assert all(r.n_bytes > 0 for r in rows)

    back = tfr.read_tfrecord(spark, out, dim=3)
    got = sorted(
        (tuple(r.features), r.label) for r in back.collect()
    )
    want = sorted(
        (tuple(r.features), r.label) for r in df.select("features", "label").collect()
    )
    assert got == want


def test_spark_sink_reference_libsvm_parity(spark, tmp_path):
    """Mirror LR/TFRecord_process.py: libsvm row -> one-hot float32
    vector feature + float label, written as TFRecord and read back."""
    from pyspark.ml.functions import vector_to_array

    from customer_churn_prediction_spark.sources.readers import read_libsvm

    libsvm = tmp_path / "sample.svm"
    # Spark's libsvm source requires one-based ascending indices
    libsvm.write_text("1 3:1 6:1\n0 1:1 4:1\n1 2:1 3:1\n")
    df = read_libsvm(spark, str(libsvm), num_features=6)
    dense = df.select(
        vector_to_array("features", "float32").alias("features"),
        F.col("label").cast("float").alias("label"),
    )
    out = str(tmp_path / "tfr")
    tfr.write_tfrecord(dense, out, "features", "label")
    back = tfr.read_tfrecord(spark, out, dim=6).collect()
    got = sorted((tuple(r.features), r.label) for r in back)
    assert got == sorted(
        [
            ((1.0, 0.0, 0.0, 1.0, 0.0, 0.0), 0.0),
            ((0.0, 1.0, 1.0, 0.0, 0.0, 0.0), 1.0),
            ((0.0, 0.0, 1.0, 0.0, 0.0, 1.0), 1.0),
        ]
    )


def test_rewrite_removes_stale_part_files(spark, tmp_path):
    """A second write with fewer partitions must not leave the first
    write's tail files visible to the reader glob."""
    out = str(tmp_path / "tfr")

    def mk(n_rows, parts):
        return spark.range(0, n_rows).select(
            F.array(F.col("id").cast("float")).alias("features"),
            F.lit(0.0).cast("float").alias("label"),
        ).repartition(parts)

    tfr.write_tfrecord(mk(40, 8), out)
    tfr.write_tfrecord(mk(7, 2), out)
    back = tfr.read_tfrecord(spark, out, dim=1).collect()
    assert sorted(r.features[0] for r in back) == [float(i) for i in range(7)]


def test_decode_accepts_value_before_key_field_order():
    """A conformant serializer may emit the map entry's Feature (field
    2) before its name (field 1)."""
    ex = tfr.encode_example({"label": [1.5]})

    # rebuild the same Example with the map-entry fields swapped
    feature = tfr._len_delim(2, tfr._len_delim(1, struct.pack("<1f", 1.5)))
    entry = tfr._len_delim(2, feature) + tfr._len_delim(1, b"label")
    swapped = tfr._len_delim(1, tfr._len_delim(1, entry))
    assert tfr.decode_example(swapped) == tfr.decode_example(ex) == {
        "label": [1.5]
    }


def test_encode_dispatch_edge_types():
    import numpy as np

    out = tfr.decode_example(
        tfr.encode_example(
            {
                "empty": [],                       # ambiguous -> float_list
                "np_ids": [np.int64(1 << 40), np.int64(-2)],
                "np_floats": [np.float32(0.5)],
            }
        )
    )
    assert out["empty"] == []
    assert out["np_ids"] == [1 << 40, -2]  # exact, not float32-truncated
    assert out["np_floats"] == [0.5]


# ---------------------------------------------------------------- property

from hypothesis import given, settings, strategies as st


_feature_values = st.one_of(
    st.binary(max_size=64),
    st.lists(
        st.floats(width=32, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=16,
    ),
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=16,
    ),
)


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
            min_size=1, max_size=20,
        ),
        _feature_values,
        min_size=1, max_size=5,
    )
)
def test_example_roundtrip_property(features):
    out = tfr.decode_example(tfr.encode_example(features))
    assert set(out) == set(features)
    for k, v in features.items():
        if isinstance(v, bytes):
            assert out[k] == v
        elif all(isinstance(x, int) for x in v):
            assert out[k] == v
        else:
            # float32 carrier: values survive exactly at f32 precision
            assert out[k] == [struct.unpack("<f", struct.pack("<f", x))[0]
                              for x in v]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(max_size=200), max_size=10))
def test_framing_roundtrip_property(records):
    blob = b"".join(tfr.frame_record(r) for r in records)
    assert list(tfr.unframe_records(blob)) == records


def _feature_frame(spark, n, parts):
    return spark.range(0, n).select(
        F.array(
            (F.col("id") * 0.5).cast("float"),
            (F.col("id") % 7).cast("float"),
        ).alias("features"),
        (F.col("id") % 2).cast("float").alias("label"),
    ).repartition(parts)


def test_registered_format_roundtrip_and_helper_parity(spark, tmp_path):
    """S6/S8 through the Python Data Source V2 API: the registered
    'tfrecord' format round-trips, and what it writes is byte-level
    the SAME layout the mapInPandas helpers produce — each side can
    read the other's output."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    df = _feature_frame(spark, 97, 4)
    want = sorted(
        (tuple(r.features), r.label)
        for r in df.select("features", "label").collect()
    )

    out = str(tmp_path / "v2")
    df.select("features", "label").write.format("tfrecord").mode(
        "overwrite"
    ).save(out)
    via_format = spark.read.format("tfrecord").load(out)
    assert sorted(
        (tuple(r.features), r.label) for r in via_format.collect()
    ) == want
    # cross-parity: the helper reader consumes the V2 sink's files
    assert sorted(
        (tuple(r.features), r.label)
        for r in tfr.read_tfrecord(spark, out, dim=2).collect()
    ) == want

    # ...and the V2 reader consumes the helper sink's files
    out2 = str(tmp_path / "helper")
    tfr.write_tfrecord(df, out2, "features", "label")
    assert sorted(
        (tuple(r.features), r.label)
        for r in spark.read.format("tfrecord").load(out2).collect()
    ) == want


def test_registered_format_overwrite_clears_stale_tail(spark, tmp_path):
    """A shorter overwrite must not leave the previous write's extra
    part files visible (the V2 commit clears then publishes)."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    out = str(tmp_path / "ow")
    _feature_frame(spark, 40, 8).write.format("tfrecord").mode(
        "overwrite"
    ).save(out)
    _feature_frame(spark, 7, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(out)
    back = spark.read.format("tfrecord").load(out).collect()
    assert len(back) == 7
    import glob as _glob
    assert len(_glob.glob(f"{out}/*.tfrecord")) <= 2
    assert not _glob.glob(f"{out}/*.inprogress-*")


def test_registered_format_append_accumulates(spark, tmp_path):
    """mode('append') must ADD records, never clobber a previous job's
    same-numbered part files (final names are job-qualified)."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    out = str(tmp_path / "ap")
    _feature_frame(spark, 10, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(out)
    _feature_frame(spark, 5, 2).write.format("tfrecord").mode(
        "append"
    ).save(out)
    assert spark.read.format("tfrecord").load(out).count() == 15


def test_registered_format_streams_a_drop_folder(spark, tmp_path):
    """readStream.format('tfrecord'): the first drop's records arrive,
    a second drop adds ONLY its own (exactly-once across epochs on one
    checkpoint), and the final total equals the batch read."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    src = str(tmp_path / "drops")
    _feature_frame(spark, 10, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(src)

    stream = spark.readStream.format("tfrecord").load(src)
    q = (
        stream.writeStream.format("memory")
        .queryName("tfr_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select * from tfr_stream").count() == 10
        _feature_frame(spark, 5, 1).write.format("tfrecord").mode(
            "append"
        ).save(src)
        q.processAllAvailable()
        got = spark.sql("select * from tfr_stream").count()
    finally:
        q.stop()
    assert got == 15
    assert spark.read.format("tfrecord").load(src).count() == 15


def test_registered_format_stream_restart_no_duplicates(spark, tmp_path):
    """Restart from the checkpoint: the engine replays the last
    committed batch through readBetweenOffsets (offset-set diff), so a
    third drop after restart arrives exactly once and nothing earlier
    duplicates."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    src = str(tmp_path / "drops_r")
    out = str(tmp_path / "landed")
    ckpt = str(tmp_path / "ckpt_r")
    _feature_frame(spark, 10, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(src)

    def start():
        def land(bdf, _eid):
            bdf.write.mode("append").parquet(out)

        return (
            spark.readStream.format("tfrecord").load(src)
            .writeStream.foreachBatch(land)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _feature_frame(spark, 5, 1).write.format("tfrecord").mode(
        "append"
    ).save(src)
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out).count() == 15


def test_stream_sink_exports_training_shards_from_an_event_stream(
    spark, tmp_path
):
    """The sink's intended pipeline: a continuous training-data
    export. Events arrive as a file stream, the feature projection
    runs IN the stream (float features + label, the reference's
    Example layout), and the tfrecord sink lands epoch shards that
    batch-read back equal to the batch-computed feature frame."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    drop = str(tmp_path / "events_drop")
    out = str(tmp_path / "shards")
    events = spark.range(0, 200).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 40).alias("user_id"),
        (F.col("id") % 11).cast("double").alias("value"),
    )
    events.repartition(2).write.parquet(drop)

    def features(df):
        return df.select(
            F.array(
                F.col("value").cast("float"),
                (F.col("user_id") % 5).cast("float"),
            ).alias("features"),
            (F.col("user_id") % 2).cast("float").alias("label"),
        )

    q = (
        features(spark.readStream.schema(events.schema).parquet(drop))
        .writeStream.format("tfrecord")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_export"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (tuple(r.features), r.label)
        for r in spark.read.format("tfrecord").load(out).collect()
    )
    want = sorted(
        (tuple(r.features), r.label) for r in features(events).collect()
    )
    assert got == want


def test_partition_stream_reader_is_default_and_diffs_offsets(tmp_path):
    """The default stream reader is the partition-based one: offsets
    are the processed-file set, an epoch is one InputPartition per NEW
    file, and decode happens per-partition (executor-side)."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        TFRecordDataSource,
        TFRecordPartitionStreamReader,
    )
    from customer_churn_prediction_spark.sources import tfrecord as tfr_mod

    d = tmp_path / "drop"
    d.mkdir()
    import numpy as np

    for name, vals in [("a.tfrecord", [1.0]), ("b.tfrecord", [2.0])]:
        ex = tfr_mod.encode_example(
            {
                "feature": np.asarray(vals, dtype=np.float32).tobytes(),
                "label": [0.0],
            }
        )
        (d / name).write_bytes(tfr_mod.frame_record(ex))

    src = TFRecordDataSource({"path": str(d)})
    reader = src.streamReader(schema=None)
    assert isinstance(reader, TFRecordPartitionStreamReader)

    start = reader.initialOffset()
    end = reader.latestOffset()
    parts = reader.partitions(start, end)
    assert len(parts) == 2  # one partition per new file
    rows = [r for p in parts for r in reader.read(p)]
    assert sorted(r[0][0] for r in rows) == [1.0, 2.0]
    # second epoch with nothing new: empty diff
    assert reader.partitions(end, reader.latestOffset()) == []

    # option("reader", "simple") routes to the driver-side variant
    import pytest as _pytest
    from pyspark.errors import PySparkNotImplementedError

    simple_src = TFRecordDataSource({"path": str(d), "reader": "simple"})
    with _pytest.raises(PySparkNotImplementedError):
        simple_src.streamReader(schema=None)


def test_stream_simple_reader_option_end_to_end(spark, tmp_path):
    """option('reader', 'simple') keeps the driver-side simple reader
    fully working through the engine (prefetch-cache path included)."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    src = str(tmp_path / "drops_simple")
    _feature_frame(spark, 10, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(src)
    q = (
        spark.readStream.format("tfrecord")
        .option("reader", "simple")
        .load(src)
        .writeStream.format("memory")
        .queryName("tfr_simple")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_simple"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from tfr_simple").count()
    finally:
        q.stop()
    assert got == 10


def test_registered_format_stream_sink_relays_a_stream(spark, tmp_path):
    """writeStream.format('tfrecord'): a tfrecord drop folder relays
    through the stream READER into the stream SINK across two epochs;
    the landed folder batch-reads back value-equal to the source, and
    each epoch's files are immutable once published (epoch 2 adds its
    own files without touching epoch 1's)."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "landed_tfr")
    _feature_frame(spark, 10, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(src)

    def start():
        return (
            spark.readStream.format("tfrecord").load(src)
            .writeStream.format("tfrecord")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt_sink"))
            .outputMode("append")
            .start()
        )

    import glob as g

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first_epoch = {
        p: os.path.getmtime(p)
        for p in g.glob(os.path.join(out, "*.tfrecord"))
    }
    assert first_epoch
    assert spark.read.format("tfrecord").load(out).count() == 10

    _feature_frame(spark, 5, 1).write.format("tfrecord").mode(
        "append"
    ).save(src)
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = sorted(
        (tuple(r.features), r.label)
        for r in spark.read.format("tfrecord").load(out).collect()
    )
    want = sorted(
        (tuple(r.features), r.label)
        for r in spark.read.format("tfrecord").load(src).collect()
    )
    assert got == want
    # epoch-1 files untouched by epoch 2's publish
    for p, mtime in first_epoch.items():
        assert os.path.getmtime(p) == mtime
    # no leftover in-progress temps
    assert not g.glob(os.path.join(out, ".epoch-*"))


def test_stream_sink_never_clobbers_another_lineage(spark, tmp_path):
    """Epoch names are query-lineage-qualified: a stream sink starting
    at batchId 0 into a folder that already holds ANOTHER writer's
    files (a batch export here) must add, never clobber."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    out = str(tmp_path / "shared")
    _feature_frame(spark, 7, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(out)
    import glob as g

    pre = set(g.glob(os.path.join(out, "*.tfrecord")))

    src = str(tmp_path / "src_lineage")
    _feature_frame(spark, 5, 1).write.format("tfrecord").mode(
        "overwrite"
    ).save(src)
    q = (
        spark.readStream.format("tfrecord").load(src)
        .writeStream.format("tfrecord")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_lineage"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert pre < set(g.glob(os.path.join(out, "*.tfrecord")))
    assert spark.read.format("tfrecord").load(out).count() == 12


def test_stream_sink_replayed_epoch_overwrites_not_duplicates(
    spark, tmp_path
):
    """Worst-case crash window: the sink PUBLISHED an epoch but the
    engine never logged the commit (simulated by deleting the
    checkpoint's commit marker). The restarted query re-runs the same
    batchId; the deterministic part-b{batchId} names make the replay
    overwrite its own files, so the landed folder holds the epoch
    exactly once."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    src = str(tmp_path / "src_r")
    out = str(tmp_path / "landed_r")
    ckpt = tmp_path / "ckpt_replay"
    _feature_frame(spark, 10, 2).write.format("tfrecord").mode(
        "overwrite"
    ).save(src)

    def start():
        return (
            spark.readStream.format("tfrecord").load(src)
            .writeStream.format("tfrecord")
            .option("path", out)
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.format("tfrecord").load(out).count() == 10

    # Crash window: sink output is visible, engine commit log is not.
    # (The .crc checksum sidecar must go too, or the replayed commit's
    # rename trips over it.)
    commit0 = ckpt / "commits" / "0"
    assert commit0.exists()
    commit0.unlink()
    crc = ckpt / "commits" / ".0.crc"
    if crc.exists():
        crc.unlink()

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.format("tfrecord").load(out).count() == 10


def test_registered_format_empty_and_missing_dir_is_empty_scan(
    spark, tmp_path
):
    """The docstring promise (review r7): a missing or empty directory
    is an EMPTY batch scan, matching the file-source convention — not
    an AttributeError from the [None] partition PySpark substitutes
    for an empty partitions() list."""
    from customer_churn_prediction_spark.sources.tfrecord_datasource import (
        register_tfrecord_format,
    )

    register_tfrecord_format(spark)
    empty = tmp_path / "empty_dir"
    empty.mkdir()
    assert spark.read.format("tfrecord").load(str(empty)).count() == 0
    missing = str(tmp_path / "never_written")
    assert spark.read.format("tfrecord").load(missing).count() == 0
