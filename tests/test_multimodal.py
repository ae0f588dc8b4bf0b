"""Multimodal plumbing: schema, batch shape, determinism, stub gating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_engineering_tk_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark, n=60, seed=42).cache()


def test_payload_meta_jvm_side(media):
    out = MM.with_payload_meta(media).toPandas()
    assert (out["payload_bytes"] == 512).all()
    assert out["payload_sha256"].nunique() == 60  # distinct payloads


def test_extract_features_shape_and_determinism(media):
    a = MM.extract_media_features(media, feature_dim=16).toPandas().sort_values("media_id")
    b = MM.extract_media_features(media, feature_dim=16).toPandas().sort_values("media_id")
    assert "payload" not in a.columns  # bytes dropped before downstream
    assert all(len(v) == 16 for v in a["feature"])
    for x, y in zip(a["feature"], b["feature"]):
        assert np.allclose(x, y)  # hash-seeded stub is deterministic


def test_real_codec_path_is_gated(media):
    with pytest.raises(Exception) as ei:
        MM.extract_media_features(media, decode_stub=False).count()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling_explodes_rows(media):
    frames = MM.frame_sample_stub(media, every_s=2.0).toPandas()
    audio = media.filter(F.col("duration_s").isNotNull()).toPandas()
    exp = sum(max(1, int(d / 2.0)) for d in audio["duration_s"])
    assert len(frames) == exp
    assert (frames.groupby("media_id")["frame_idx"].min() == 0).all()


def test_resize_updates_metadata(media):
    out = MM.resize_stub(media, (224, 224)).toPandas()
    img = out[out["mime"].str.startswith("image")]
    assert (img["width"] == 224).all() and (img["height"] == 224).all()
