"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata
(mime, width/height/duration, sha256). The Spark-side machinery —
schema, partition discipline, Arrow-batched UDF signatures, batch
shapes — is real and tested. Codecs: ``decode_stub=True`` produces a
deterministic fake feature vector from the bytes; ``decode_stub=False``
runs a REAL vendored pure-numpy BMP codec (uncompressed 24/32-bit
BI_RGB — decode, pixel-stat features, nearest-neighbour resize) and
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
                    else:
                        raise NotImplementedError(
                            f"real codec for {mime}: plug Pillow/torchaudio "
                            "decode here (only image/bmp ships a vendored "
                            "pure-numpy decoder)"
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
