"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata
(mime, width/height/duration, sha256). The Spark-side machinery —
schema, partition discipline, Arrow-batched UDF signatures, batch
shapes — is real and tested; the actual codec step is STUBBED because
this container has no image/audio libraries: ``decode_stub=True``
produces a deterministic fake feature vector from the bytes, and
``decode_stub=False`` raises ``NotImplementedError`` at the exact
point where Pillow/torchaudio/pyav would plug in.

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
            if not decode_stub:
                raise NotImplementedError(
                    "real codec path: plug Pillow/torchaudio decode here"
                )
            feats = [
                None if b is None else _decode_image_stub(bytes(b), feature_dim)
                for b in pdf[payload_col]
            ]
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
            if not decode_stub:
                raise NotImplementedError("real resize: Pillow Image.resize here")
            out = pdf.copy()
            img = out["mime"].str.startswith("image")
            out.loc[img, "width"] = target[0]
            out.loc[img, "height"] = target[1]
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
