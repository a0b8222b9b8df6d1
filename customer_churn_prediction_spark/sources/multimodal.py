"""Multimodal (image/audio/video) column plumbing.

North-star requirement: treat media as opaque ``binary`` columns with
typed metadata, and run decode / feature-extract / resize /
frame-sample as Arrow-batched pandas functions over ``mapInPandas``.
The decode itself is STUBBED (no image/audio libs in this container —
``decode_image`` raises NotImplementedError and the pipeline uses a
deterministic fake featureizer instead), but everything Spark-side is
real and tested: the binary schema, the mapInPandas batch iteration,
the output schema contract, and partition-parallel execution.

At 100 TB the shape matters more than the codec: media bytes stay in
one column of a columnar file (never exploded into rows), decode
happens once per Arrow batch inside the executor (no driver
round-trip), and the output is a fixed-width feature struct that
downstream joins/aggregations treat like any other column.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_EMBED_DIM = 8
# Embedding dims land as emb_0..emb_7 scalar doubles, not one
# array<float> column: fixed-width features as flat columns are both
# the columnar-storage-friendly layout (each dim prunes/compresses
# independently) and what the driver's canonicalizer can sort/hash
# (pandas cannot sort object-list columns — r2 crash).
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "byte_mean double, byte_mode int, "
    + ", ".join(f"emb_{i} double" for i in range(_EMBED_DIM))
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: documents' text bytes play the opaque
    binary payload (binary column + typed metadata), exactly the
    schema a real image/audio table would have."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media_bytes"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.length("text").cast("long").alias("n_bytes_meta"),
    )


def decode_image(payload: bytes):
    """Real decoder entry point — requires an image codec library that
    is not available in this container."""
    raise NotImplementedError(
        "image decode requires e.g. Pillow; wire it here in a deployment"
    )


def _fake_features(payload: bytes) -> tuple[float, int, list[float]]:
    """Deterministic stand-in for decode+extract: byte statistics and a
    fixed-width pseudo-embedding from byte histogram buckets.
    numpy-vectorized — the per-byte work runs at C speed inside the
    Arrow batch, the shape a real featurizer would have."""
    import numpy as np

    if not payload:
        return 0.0, 0, [0.0] * _EMBED_DIM
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    mode = int(np.flatnonzero(counts == counts.max())[0])  # tie → smallest
    hist = np.bincount(arr % _EMBED_DIM, minlength=_EMBED_DIM)
    # mean and hist/n are exact: integer sums < 2^53 divided by n give
    # the same double in numpy and in the DuckDB oracle's avg/count.
    return float(arr.mean()), mode, (hist / arr.size).tolist()


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows
    out. One python worker per partition — no per-row overhead."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # numpy imported once per task (guide §4.5), batch columns
        # assembled as arrays instead of per-row Python lists (r14:
        # the old shape built 5 + _EMBED_DIM Python lists by looping
        # the feature tuples per row — O(rows × dim) interpreter
        # work per batch; the per-payload byte math is unchanged).
        import numpy as np

        for pdf in it:
            feats = [_fake_features(p) for p in pdf["media_bytes"]]
            emb = np.array([f[2] for f in feats], dtype=np.float64)
            cols = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["media_bytes"].map(len),
                "byte_mean": np.fromiter(
                    (f[0] for f in feats), dtype=np.float64,
                    count=len(feats),
                ),
                "byte_mode": np.fromiter(
                    (f[1] for f in feats), dtype=np.int64,
                    count=len(feats),
                ),
            }
            for i in range(_EMBED_DIM):
                cols[f"emb_{i}"] = (
                    emb[:, i] if len(feats) else np.empty(0)
                )
            yield pd.DataFrame(cols)

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: binary-column media pipeline, oracle-paired (the
    documents fixture is pure ASCII, so the DuckDB oracle can rebuild
    the UTF-8 byte stream with per-char codepoints)."""
    return extract_features(media_table(spark, sf_dir))


_FRAME_SCHEMA = "doc_id long, frame_idx long, frame_bytes binary, frame_len long"
_N_FRAMES = 4
_RESIZE_SCHEMA = "doc_id long, media_type string, thumb binary"


def frame_sample(media: DataFrame, n_frames: int = _N_FRAMES) -> DataFrame:
    """Video frame sampling shape: one media row fans out to
    ``n_frames`` evenly spaced 'frames' (byte slices stand in for
    decoded frames). mapInPandas so a real decoder drops in without
    changing the plan; the fan-out happens executor-side per Arrow
    batch — the driver never sees media bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": [],
                    "frame_len": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media_bytes"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    frame = bytes(payload[i * step:(i + 1) * step])
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(frame)
                    rows["frame_len"].append(len(frame))
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=_FRAME_SCHEMA)


def resize_thumbnail(media: DataFrame, target_bytes: int = 32) -> DataFrame:
    """Resize shape: fixed-size thumbnail per media row (byte
    truncation stands in for a real resampler — wire Pillow into
    ``_thumb`` in a deployment). Output is a bounded-width binary
    column safe to broadcast or collect."""

    def _thumb(payload: bytes) -> bytes:
        return bytes(payload[:target_bytes])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "thumb": [_thumb(p) for p in pdf["media_bytes"]],
                }
            )

    return media.mapInPandas(batches, schema=_RESIZE_SCHEMA)


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only): frame-sampling fan-out + per-frame
    aggregation back to one row per doc (the decode→sample→aggregate
    pipeline a video featurizer runs)."""
    frames = frame_sample(media_table(spark, sf_dir))
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_len").alias("sampled_bytes"),
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frames": multimodal_frames,
}

_MEDIA_TYPE_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' "
    "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)

# Oracle contract: the fixture text is ASCII (asserted in
# tests/test_multimodal.py), so UTF-8 byte k == codepoint of char k and
# DuckDB can replay the numpy byte math exactly — integer sums divided
# by integer counts are the same double in both engines. Docs with
# empty text would drop out of the per-byte aggregate (Spark emits a
# zero row); the fixture has none.
ORACLES = {
    "multimodal_features": f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
  FROM documents
),
bytes AS (
  SELECT doc_id, ascii(substring(text, CAST(i AS INT), 1)) AS byte
  FROM pos
),
stats AS (
  SELECT doc_id,
         avg(byte) AS byte_mean,
         {", ".join(
             f"CAST(count(*) FILTER (WHERE byte % {_EMBED_DIM} = {i}) AS DOUBLE)"
             f" / count(*) AS emb_{i}"
             for i in range(_EMBED_DIM)
         )}
  FROM bytes GROUP BY doc_id
),
modes AS (
  SELECT doc_id, byte AS byte_mode,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY count(*) DESC, byte) AS rn
  FROM bytes GROUP BY doc_id, byte
)
SELECT d.doc_id, {_MEDIA_TYPE_SQL} AS media_type,
       CAST(length(d.text) AS BIGINT) AS n_bytes,
       s.byte_mean, CAST(m.byte_mode AS INTEGER) AS byte_mode,
       {", ".join(f"s.emb_{i}" for i in range(_EMBED_DIM))}
FROM documents d
JOIN stats s USING (doc_id)
JOIN modes m ON m.doc_id = d.doc_id AND m.rn = 1
""",
    # frame_sample slices payload into n evenly spaced step-wide frames
    # (step = max(len // n, 1)); total sampled bytes close over the
    # slice arithmetic: n * (len // n) when len >= n, else min(len, n).
    "multimodal_frames": f"""
SELECT doc_id,
       CAST({_N_FRAMES} AS BIGINT) AS n_frames,
       CAST(CASE WHEN length(text) >= {_N_FRAMES}
                 THEN {_N_FRAMES} * (length(text) // {_N_FRAMES})
                 ELSE least(length(text), {_N_FRAMES}) END
            AS BIGINT) AS sampled_bytes
FROM documents
"""}
