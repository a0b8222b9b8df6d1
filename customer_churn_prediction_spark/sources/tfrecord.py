"""TFRecord source and sink (S6/S8) without TensorFlow.

The reference's training-data hand-off is the TFRecord file format:
``LR/TFRecord_process.py:17-35`` writes one ``tf.train.Example`` per
libsvm row with a ``"feature"`` bytes entry (the dense float32 vector's
raw bytes) and a ``"label"`` float entry. Neither tensorflow nor
protobuf nor crc32c exist in this container, so this module implements
the two public wire formats directly:

* **TFRecord framing** — each record is
  ``uint64le length | uint32le masked_crc32c(length) | data |
  uint32le masked_crc32c(data)`` with Castagnoli CRC-32C and mask
  ``((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``.
* **A minimal ``tf.train.Example`` proto codec** — the
  Example/Features/Feature/BytesList/FloatList/Int64List message
  subset the reference uses, hand-encoded on the protobuf wire format
  (map entries serialized in sorted-key order for determinism).

Spark integration follows the sanctioned pandas-path policy (§2.10
U4): the sink is a ``mapInPandas`` pass whose Arrow batches are
encoded per partition and appended to one ``part-<pid>.tfrecord``
file per task (the output row is a per-partition manifest — bytes
never reach the driver); the source reads ``binaryFile`` rows and
parses them back batch-wise. At cluster scale each task streams its
own partition file; the driver only sees the manifest.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# ------------------------------------------------------------------ crc32c

_CRC32C_POLY = 0x82F63B78  # reversed Castagnoli polynomial


def _make_table() -> list[int]:
    table = []
    for n in range(256):
        crc = n
        for _ in range(8):
            crc = (crc >> 1) ^ (_CRC32C_POLY if crc & 1 else 0)
        table.append(crc)
    return table


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    """Castagnoli CRC-32C (crc32c(b"123456789") == 0xE3069283)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = _TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- proto wire helpers


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


# ------------------------------------------------------------ Example codec

# Feature oneof field numbers (feature.proto): 1=bytes_list,
# 2=float_list, 3=int64_list; every list's repeated value is field 1.


def encode_example(features: dict[str, object]) -> bytes:
    """Serialize ``{name: bytes | [float] | [int]}`` as a
    ``tf.train.Example``. Map entries go out in sorted-key order so the
    byte stream is deterministic. Integral values (incl. numpy ints,
    excl. bools) become an int64_list; any other non-bytes sequence —
    including the ambiguous empty list — becomes a float_list (the
    reference layout's common case)."""
    import numbers

    entries = bytearray()
    for name in sorted(features):
        value = features[name]
        if isinstance(value, bytes):
            kind = _len_delim(1, _len_delim(1, value))
        elif value and all(
            isinstance(v, numbers.Integral) and not isinstance(v, bool)
            for v in value
        ):
            packed = b"".join(
                _varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in value
            )
            kind = _len_delim(3, _len_delim(1, packed))
        else:
            packed = struct.pack(f"<{len(value)}f", *(float(v) for v in value))
            kind = _len_delim(2, _len_delim(1, packed))
        entry = _len_delim(1, name.encode()) + _len_delim(2, kind)
        entries += _len_delim(1, entry)
    return _len_delim(1, bytes(entries))


def decode_example(data: bytes) -> dict[str, object]:
    """Inverse of :func:`encode_example` (accepts any field order)."""

    def fields(buf: bytes) -> Iterator[tuple[int, bytes]]:
        pos = 0
        while pos < len(buf):
            key, pos = _read_varint(buf, pos)
            field, wire = key >> 3, key & 7
            if wire == 2:
                size, pos = _read_varint(buf, pos)
                yield field, buf[pos : pos + size]
                pos += size
            elif wire == 0:
                val, pos = _read_varint(buf, pos)
                yield field, _varint(val)
            else:  # pragma: no cover - not produced by this codec
                raise ValueError(f"unsupported wire type {wire}")

    out: dict[str, object] = {}
    (_, features_buf), = fields(data)
    for _, entry in fields(features_buf):
        # a conformant serializer may emit the map-entry fields in any
        # order: gather both before decoding the value
        name = feature_buf = None
        for f, payload in fields(entry):
            if f == 1:
                name = payload.decode()
            elif f == 2:
                feature_buf = payload
        if name is None or feature_buf is None:
            raise ValueError("map entry missing key or value field")
        (kind_field, kind_payload), = fields(feature_buf)
        (_, raw), = fields(kind_payload)
        if kind_field == 1:
            out[name] = raw
        elif kind_field == 2:
            out[name] = list(struct.unpack(f"<{len(raw) // 4}f", raw))
        else:
            vals, pos = [], 0
            while pos < len(raw):
                v, pos = _read_varint(raw, pos)
                if v >= 1 << 63:
                    v -= 1 << 64
                vals.append(v)
            out[name] = vals
    return out


# --------------------------------------------------------------- framing


def frame_record(data: bytes) -> bytes:
    header = struct.pack("<Q", len(data))
    return (
        header
        + struct.pack("<I", _masked_crc(header))
        + data
        + struct.pack("<I", _masked_crc(data))
    )


def unframe_records(blob: bytes) -> Iterator[bytes]:
    pos = 0
    while pos < len(blob):
        header = blob[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", blob[pos + 8 : pos + 12])
        if hcrc != _masked_crc(header):
            raise ValueError(f"corrupt length crc at offset {pos}")
        data = blob[pos + 12 : pos + 12 + length]
        (dcrc,) = struct.unpack(
            "<I", blob[pos + 12 + length : pos + 16 + length]
        )
        if dcrc != _masked_crc(data):
            raise ValueError(f"corrupt data crc at offset {pos}")
        yield data
        pos += 16 + length


# ---------------------------------------------------------- Spark sink/source


def write_tfrecord(
    df: DataFrame, out_dir: str, vector_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """Reference-parity TFRecord sink (``LR/TFRecord_process.py:30-33``):
    per row an Example with ``"feature"`` = raw float32 bytes of the
    dense vector and ``"label"`` = float list. One file per partition,
    written inside the task; returns the collected per-partition
    manifest as a DataFrame (path, n_records, n_bytes).

    Output-commit discipline: stale ``part-*.tfrecord`` files from a
    previous write to the same directory are removed up front (else a
    later write with fewer partitions would leave the old tail visible
    to the reader's glob), and each task writes to an
    attempt-qualified temp name atomically renamed on completion — a
    retried or speculative attempt can interleave with a zombie
    without ever exposing a half-written file (deterministic content
    per partition makes last-rename-wins idempotent)."""
    import numpy as np
    from pyspark import TaskContext

    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    for stale in os.listdir(out_dir):
        if stale.endswith(".tfrecord") or ".tfrecord.inprogress-" in stale:
            os.remove(os.path.join(out_dir, stale))
    src = df.select(vector_col, label_col)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.tfrecord")
        tmp = f"{path}.inprogress-{ctx.taskAttemptId()}"
        n = nbytes = 0
        with open(tmp, "wb") as f:
            for pdf in batches:
                for vec, label in zip(pdf[vector_col], pdf[label_col]):
                    rec = frame_record(
                        encode_example(
                            {
                                "feature": np.asarray(
                                    vec, dtype=np.float32
                                ).tobytes(),
                                "label": [float(label)],
                            }
                        )
                    )
                    f.write(rec)
                    n += 1
                    nbytes += len(rec)
        if n == 0:
            os.remove(tmp)
            return
        os.replace(tmp, path)  # atomic publish
        yield pd.DataFrame(
            {"path": [path], "n_records": [n], "n_bytes": [nbytes]}
        )

    manifest = src.mapInPandas(
        write_partition, "path string, n_records long, n_bytes long"
    ).collect()
    return spark.createDataFrame(
        manifest, "path string, n_records long, n_bytes long"
    )


def read_tfrecord(
    spark: SparkSession, in_dir: str, dim: int | None = None
) -> DataFrame:
    """Read reference-layout TFRecord files back into
    ``(features array<float>, label float)`` rows. Each binaryFile row
    (one file) is parsed inside its task — file bytes stay executor-side."""
    files = spark.read.format("binaryFile").load(
        os.path.join(in_dir, "*.tfrecord")
    ).select("content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats, labels = [], []
            for blob in pdf["content"]:
                for rec in unframe_records(bytes(blob)):
                    ex = decode_example(rec)
                    vec = np.frombuffer(ex["feature"], dtype=np.float32)
                    if dim is not None and len(vec) != dim:
                        raise ValueError(
                            f"expected dim {dim}, got {len(vec)}"
                        )
                    feats.append(vec.tolist())
                    labels.append(ex["label"][0])
            yield pd.DataFrame({"features": feats, "label": labels})

    return files.mapInPandas(parse, "features array<float>, label float")
