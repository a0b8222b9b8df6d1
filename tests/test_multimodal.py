import pytest

from customer_churn_prediction_spark.sources import multimodal


def test_media_schema_and_features(spark, sf_smoke):
    media = multimodal.media_table(spark, sf_smoke)
    assert dict(media.dtypes)["media_bytes"] == "binary"
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    r = rows[0]
    emb = [r[f"emb_{i}"] for i in range(8)]
    assert abs(sum(emb) - 1.0) < 1e-6  # histogram normalized
    assert r.n_bytes > 0 and 0 < r.byte_mean < 256


def test_documents_fixture_is_ascii(spark, sf_smoke):
    # The multimodal_features oracle rebuilds bytes from codepoints —
    # valid only while the fixture stays ASCII (documented contract).
    d = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    from pyspark.sql import functions as F

    bad = d.where(
        F.col("text").isNull()
        | (F.length("text") != F.octet_length("text"))
    ).count()
    assert bad == 0


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_frame_sample_fanout_and_resize(spark, sf_smoke):
    media = multimodal.media_table(spark, sf_smoke)
    n_docs = media.count()
    frames = multimodal.frame_sample(media, n_frames=4)
    assert frames.count() == 4 * n_docs
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)
    thumbs = multimodal.resize_thumbnail(media, target_bytes=16).collect()
    assert len(thumbs) == n_docs
    assert all(len(t.thumb) <= 16 for t in thumbs)
    assert dict(multimodal.resize_thumbnail(media).dtypes)["thumb"] == "binary"


def test_features_deterministic(spark, sf_smoke):
    media = multimodal.media_table(spark, sf_smoke)
    a = sorted(map(str, multimodal.extract_features(media).collect()))
    b = sorted(map(str, multimodal.extract_features(media).collect()))
    assert a == b
