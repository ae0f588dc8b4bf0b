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
    # compressed formats (png/jpeg) have no vendored decoder; the real
    # path must fail loudly at the documented plug-in point
    compressed = media.filter(F.col("mime").isin("image/png", "image/jpeg"))
    with pytest.raises(Exception) as ei:
        MM.extract_media_features(compressed, decode_stub=False).count()
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


def _gradient_rgb(h, w):
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    return np.concatenate(
        [np.broadcast_to(y * 3 % 256, (h, w, 1)),
         np.broadcast_to(x * 5 % 256, (h, w, 1)),
         np.broadcast_to((y + x) * 7 % 256, (h, w, 1))],
        axis=2,
    ).astype(np.uint8)


def test_bmp_roundtrip_and_variants():
    rgb = _gradient_rgb(13, 17)  # odd width exercises row padding
    assert np.array_equal(MM.decode_bmp(MM.encode_bmp(rgb)), rgb)
    # top-down (negative height) variant
    # encode stores rows bottom-up (file rows = image[::-1]); flipping
    # the height sign marks those stored rows as top-down, so decoding
    # yields the vertically flipped image
    b = bytearray(MM.encode_bmp(rgb))
    h = int.from_bytes(b[22:26], "little")
    b[22:26] = (-h).to_bytes(4, "little", signed=True)
    assert np.array_equal(MM.decode_bmp(bytes(b)), rgb[::-1])
    # 32-bit BGRA variant built by hand
    h32, w32 = 4, 5
    bgra = np.zeros((h32, w32, 4), np.uint8)
    bgra[..., :3] = _gradient_rgb(h32, w32)[..., ::-1]
    data = bgra[::-1].tobytes()
    hdr = (b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\x00" * 4
           + (54).to_bytes(4, "little"))
    dib = ((40).to_bytes(4, "little") + w32.to_bytes(4, "little", signed=True)
           + h32.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
           + (32).to_bytes(2, "little") + (0).to_bytes(4, "little")
           + len(data).to_bytes(4, "little") + (0).to_bytes(4, "little") * 4)
    assert np.array_equal(MM.decode_bmp(hdr + dib + data), _gradient_rgb(h32, w32))
    with pytest.raises(ValueError):
        MM.decode_bmp(b"not a bitmap at all........................................")


@pytest.fixture(scope="module")
def bmp_media(spark):
    rows = []
    for i in range(6):
        rgb = _gradient_rgb(8 + i, 10 + i)
        rows.append((i, "image/bmp", bytearray(MM.encode_bmp(rgb)),
                     rgb.shape[1], rgb.shape[0], None))
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_real_bmp_features_end_to_end(bmp_media):
    """decode_stub=False produces REAL pixel statistics through
    mapInPandas for the vendored BMP format."""
    out = (
        MM.extract_media_features(bmp_media, feature_dim=16, decode_stub=False)
        .toPandas()
        .sort_values("media_id")
    )
    for i, feat in zip(out["media_id"], out["feature"]):
        rgb = _gradient_rgb(8 + i, 10 + i).astype(np.float64)
        expect = [10 + i, 8 + i, *rgb.mean(axis=(0, 1)), *rgb.std(axis=(0, 1)),
                  rgb.min(), rgb.max()]
        assert np.allclose(np.asarray(feat)[: len(expect)], expect, atol=1e-4)
        assert np.all(np.asarray(feat)[len(expect):] == 0)


def _test_tone(n=800, rate=8000, channels=1, freq=440.0):
    t = np.arange(n, dtype=np.float64) / rate
    mono = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.repeat(mono[:, None], channels, axis=1)


def test_wav_roundtrip_and_variants():
    tone = _test_tone(channels=2)
    samples, rate = MM.decode_wav(MM.encode_wav(tone, 8000))
    assert rate == 8000 and samples.shape == tone.shape
    assert np.allclose(samples, tone, atol=1.0 / 32767)
    # 8-bit unsigned PCM variant built by hand
    mono8 = np.clip(np.round(_test_tone()[:, 0] * 127 + 128), 0, 255).astype(np.uint8)
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(mono8).to_bytes(4, "little") + mono8.tobytes())
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    dec, rate8 = MM.decode_wav(payload)
    assert rate8 == 8000
    assert np.allclose(dec[:, 0], (mono8.astype(np.float64) - 128) / 128)
    with pytest.raises(ValueError):
        MM.decode_wav(b"not audio at all..............................")


@pytest.fixture(scope="module")
def wav_media(spark):
    rows = []
    for i in range(4):
        tone = _test_tone(n=400 * (i + 1), rate=8000, freq=220.0 * (i + 1))
        rows.append((i, "audio/wav", bytearray(MM.encode_wav(tone, 8000)),
                     None, None, tone.shape[0] / 8000.0))
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_real_wav_features_end_to_end(wav_media):
    """decode_stub=False produces REAL audio statistics through
    mapInPandas for the vendored PCM WAV format."""
    out = (
        MM.extract_media_features(wav_media, feature_dim=16, decode_stub=False)
        .toPandas()
        .sort_values("media_id")
    )
    for i, feat in zip(out["media_id"], out["feature"]):
        feat = np.asarray(feat)
        n = 400 * (i + 1)
        assert feat[0] == 1 and feat[1] == 8000
        assert np.isclose(feat[2], n / 8000.0, atol=1e-6)
        # RMS of a 0.5-amplitude sine ≈ 0.5/sqrt(2); peak ≈ 0.5
        assert np.isclose(feat[3], 0.5 / np.sqrt(2), atol=0.01)
        assert np.isclose(feat[4], 0.5, atol=0.01)
        # ZCR of a k·220 Hz tone at 8 kHz ≈ 2·freq/rate
        assert np.isclose(feat[5], 2 * 220.0 * (i + 1) / 8000.0, atol=0.02)
        assert np.all(feat[7:] == 0)


def test_real_bmp_resize_end_to_end(bmp_media):
    out = MM.resize_stub(bmp_media, (6, 4), decode_stub=False).toPandas()
    for _, r in out.iterrows():
        resized = MM.decode_bmp(bytes(r["payload"]))
        assert resized.shape == (4, 6, 3)
        assert r["width"] == 6 and r["height"] == 4
        # nearest-neighbour: every pixel exists in the source image
        src = _gradient_rgb(8 + r["media_id"], 10 + r["media_id"])
        flat = {tuple(p) for p in src.reshape(-1, 3)}
        assert all(tuple(p) in flat for p in resized.reshape(-1, 3))
