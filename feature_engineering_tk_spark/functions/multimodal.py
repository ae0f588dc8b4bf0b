"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata
(mime, width/height/duration, sha256). The Spark-side machinery —
schema, partition discipline, Arrow-batched UDF signatures, batch
shapes — is real and tested. Codecs: ``decode_stub=True`` produces a
deterministic fake feature vector from the bytes; ``decode_stub=False``
runs REAL vendored pure-numpy codecs for the uncompressed formats —
BMP (24/32-bit BI_RGB: decode, pixel-stat features, nearest-neighbour
resize) and WAV (8/16-bit PCM: decode, RMS/peak/ZCR features) — and
raises ``NotImplementedError`` for compressed formats at the exact
point where Pillow/torchaudio/pyav would plug in (absent from this
container).

Scale design:
- payloads never pass through a shuffle: feature extraction happens
  in ``mapInPandas`` directly over the scan, emitting only the small
  feature columns (project-early discipline);
- ``maxRecordsPerBatch`` bounds Arrow batch memory for fat rows; for
  multi-MB payloads set it to ~64 via ``media_arrow_conf``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

media_arrow_conf = {"spark.sql.execution.arrow.maxRecordsPerBatch": "64"}


def synthesize_media(spark, n: int = 100, seed: int = 42, payload_bytes: int = 512) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) so the
    plumbing is testable without codecs."""
    rng = np.random.default_rng(seed)
    rows = []
    mimes = ["image/png", "image/jpeg", "audio/wav"]
    for i in range(n):
        payload = rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
        mime = mimes[i % len(mimes)]
        is_img = mime.startswith("image")
        rows.append(
            (
                i,
                mime,
                bytearray(payload),
                int(rng.integers(16, 512)) if is_img else None,
                int(rng.integers(16, 512)) if is_img else None,
                float(rng.uniform(0.5, 30.0)) if not is_img else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def with_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side payload metadata: byte length + sha256 + crc32 —
    dedup keys for binary columns without any Python."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "payload_bytes": F.length(p).cast("long"),
            "payload_sha256": F.sha2(p, 256),
            "payload_crc32": F.crc32(p),
        }
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Vendored pure-numpy BMP decoder (uncompressed BI_RGB, 24/32-bit,
    bottom-up or top-down, 4-byte row padding) → (H, W, 3) uint8 RGB.

    This makes one real format exercisable end-to-end without any
    image library in the container; Pillow remains the documented fast
    path for compressed formats (png/jpeg) in a real deployment.
    """
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0:
        raise ValueError(f"only uncompressed BI_RGB supported, got compression={comp}")
    if bpp not in (24, 32):
        raise ValueError(f"only 24/32-bit BMPs supported, got {bpp}")
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    top_down, height = h < 0, abs(h)
    nb = bpp // 8
    stride = ((w * nb + 3) // 4) * 4
    if data_off + stride * height > len(b):
        raise ValueError("truncated BMP pixel array")
    px = np.frombuffer(b, np.uint8, count=stride * height, offset=data_off)
    rows = px.reshape(height, stride)[:, : w * nb].reshape(height, w, nb)
    rgb = rows[..., :3][..., ::-1]  # stored BGR(A) → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes (the
    test/synthesis twin of :func:`decode_bmp`)."""
    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    height, width = arr.shape[:2]
    bgr = arr[..., ::-1]
    stride = ((width * 3 + 3) // 4) * 4
    rows = np.zeros((height, stride), np.uint8)
    rows[:, : width * 3] = bgr[::-1].reshape(height, width * 3)
    data = rows.tobytes()
    off = 14 + 40
    hdr = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00" * 4
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return hdr + dib + data


def _bmp_features(payload: bytes, dim: int) -> np.ndarray:
    """Real pixel statistics from a decoded BMP, padded/truncated to
    ``dim``: [W, H, mean RGB (3), std RGB (3, population), min, max]."""
    rgb = decode_bmp(payload).astype(np.float64)
    stats = [
        float(rgb.shape[1]),
        float(rgb.shape[0]),
        *rgb.mean(axis=(0, 1)).tolist(),
        *rgb.std(axis=(0, 1)).tolist(),
        float(rgb.min()),
        float(rgb.max()),
    ]
    out = np.zeros(dim, np.float32)
    out[: min(dim, len(stats))] = np.asarray(stats[:dim], np.float32)
    return out


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Vendored pure-numpy WAV decoder (RIFF/WAVE, PCM 8-bit unsigned
    or 16-bit signed, any channel count) → ((n_frames, n_channels)
    float64 in [-1, 1], sample_rate).

    The audio twin of :func:`decode_bmp`: one real uncompressed format
    exercisable end-to-end with no audio library in the container;
    torchaudio/soundfile remain the documented fast path for
    compressed formats (mp3/flac/ogg) in a real deployment.
    """
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported, got format={audio_format}")
    if n_channels < 1 or sample_rate <= 0:
        raise ValueError(f"bad WAV header: channels={n_channels} rate={sample_rate}")
    if bits == 16:
        raw = np.frombuffer(data, "<i2", count=(len(data) // 2 // n_channels) * n_channels)
        samples = raw.astype(np.float64) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(data, np.uint8, count=(len(data) // n_channels) * n_channels)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    return samples.reshape(-1, n_channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) float in [-1, 1] → 16-bit PCM WAV bytes
    (the test/synthesis twin of :func:`decode_wav`)."""
    arr = np.atleast_2d(np.asarray(samples, np.float64))
    if arr.ndim != 2:
        raise ValueError("encode_wav expects (n_frames, n_channels)")
    n_channels = arr.shape[1]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block_align = 2 * n_channels
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + int(sample_rate).to_bytes(4, "little")
        + (int(sample_rate) * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _wav_features(payload: bytes, dim: int) -> np.ndarray:
    """Real audio statistics from decoded PCM, padded/truncated to
    ``dim``: [channels, sample_rate, duration_s, RMS, peak, zero-
    crossing rate, mean] over the channel-mean signal."""
    samples, rate = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = mono.shape[0]
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    stats = [
        float(samples.shape[1]),
        float(rate),
        float(n) / float(rate),
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        float(np.abs(mono).max()) if n else 0.0,
        zcr,
        float(mono.mean()) if n else 0.0,
    ]
    out = np.zeros(dim, np.float32)
    out[: min(dim, len(stats))] = np.asarray(stats[:dim], np.float32)
    return out


def _decode_image_stub(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode→embed': hash-seeded vector. Replace
    with Pillow decode + model forward in a real deployment."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    feature_dim: int = 16,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode/feature-extract over ``mapInPandas``: Arrow-batched,
    emits (all non-payload columns ..., feature array<float>) — the
    payload is dropped on the way out so downstream shuffles never
    carry bytes."""
    keep = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(keep + [T.StructField("feature", T.ArrayType(T.FloatType()), True)])
    keep_names = [f.name for f in keep]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                feats = [
                    None if b is None else _decode_image_stub(bytes(b), feature_dim)
                    for b in pdf[payload_col]
                ]
            else:
                # real codec path: vendored pure-numpy BMP decoder →
                # pixel statistics. Compressed formats plug in Pillow/
                # torchaudio here (not present in this container).
                feats = []
                mimes = pdf["mime"] if "mime" in pdf else ["image/bmp"] * len(pdf)
                for mime, b in zip(mimes, pdf[payload_col]):
                    if b is None:
                        feats.append(None)
                    elif mime == "image/bmp":
                        feats.append(_bmp_features(bytes(b), feature_dim))
                    elif mime in ("audio/wav", "audio/x-wav"):
                        feats.append(_wav_features(bytes(b), feature_dim))
                    else:
                        raise NotImplementedError(
                            f"real codec for {mime}: plug Pillow/torchaudio "
                            "decode here (image/bmp and audio/wav ship "
                            "vendored pure-numpy decoders)"
                        )
            out = pdf[keep_names].copy()
            out["feature"] = feats
            yield out

    return df.mapInPandas(extract, schema=out_schema)


def resize_stub(df: DataFrame, target: tuple[int, int] = (224, 224), decode_stub: bool = True) -> DataFrame:
    """Image resize plumbing: passes payloads through ``mapInPandas``
    and rewrites width/height metadata; the pixel work is the stub."""
    schema = df.schema

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            if decode_stub:
                img = out["mime"].str.startswith("image")
                out.loc[img, "width"] = target[0]
                out.loc[img, "height"] = target[1]
            else:
                # real resize for the vendored BMP path: nearest-
                # neighbour via numpy fancy indexing, re-encoded to
                # BMP. Pillow Image.resize plugs in for other formats.
                for i in out.index:
                    mime, b = out.at[i, "mime"], out.at[i, "payload"]
                    if not str(mime).startswith("image") or b is None:
                        continue
                    if mime != "image/bmp":
                        raise NotImplementedError(
                            f"real resize for {mime}: Pillow Image.resize here"
                        )
                    rgb = decode_bmp(bytes(b))
                    h0, w0 = rgb.shape[:2]
                    tw, th = target
                    ys = (np.arange(th) * h0) // th
                    xs = (np.arange(tw) * w0) // tw
                    out.at[i, "payload"] = bytearray(encode_bmp(rgb[ys][:, xs]))
                    out.at[i, "width"] = tw
                    out.at[i, "height"] = th
            yield out

    return df.mapInPandas(resize, schema=schema)


def frame_sample_stub(
    df: DataFrame, every_s: float = 1.0, decode_stub: bool = True
) -> DataFrame:
    """Video frame-sampling plumbing: one row in → N frame rows out
    (flatMap shape via mapInPandas), frame timestamps real, frame
    payload stubbed."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_s", T.DoubleType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling: pyav demux here")
            rows = []
            for _, r in pdf.iterrows():
                dur = r.get("duration_s")
                if dur is None or pd.isna(dur):
                    continue
                n = max(1, int(float(dur) / every_s))
                for k in range(n):
                    rows.append((int(r["media_id"]), k, k * every_s, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_s", "frame_payload"]
            )

    return df.mapInPandas(sample, schema=out_schema)
