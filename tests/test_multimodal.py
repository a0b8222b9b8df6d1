import pytest

from customer_churn_prediction_spark.sources import multimodal


def test_media_schema_and_features(spark, sf_smoke):
    media = multimodal.media_table(spark, sf_smoke)
    assert dict(media.dtypes)["media_bytes"] == "binary"
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert len(r.fake_embedding) == 8
    assert abs(sum(r.fake_embedding) - 1.0) < 1e-6  # histogram normalized
    assert r.n_bytes > 0 and 0 < r.byte_mean < 256


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_features_deterministic(spark, sf_smoke):
    media = multimodal.media_table(spark, sf_smoke)
    a = sorted(map(str, multimodal.extract_features(media).collect()))
    b = sorted(map(str, multimodal.extract_features(media).collect()))
    assert a == b
