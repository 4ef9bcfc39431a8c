"""Multimodal (image/audio/video) column plumbing.

Design for 100 TB media pipelines: media lives as opaque ``binary``
columns with a typed metadata struct alongside; decode / feature
extraction / resize / frame sampling run as Arrow-batched pandas
functions over ``mapInPandas`` so each task streams batches without
materializing a partition.

The actual codecs (PIL / torchaudio / ffmpeg) are NOT available in this
environment, so the decode kernels are stubbed: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by content hash) produces stable
pseudo-features. The Spark-side plumbing — schema, batching, partition
sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _fake_decode(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: features derived from
    the content digest, stable across runs and engines. Hashes the HEX
    TEXT of the content (not raw bytes) so a SQL oracle can replay it —
    DuckDB's md5() takes VARCHAR only."""
    if content is None:
        raise ValueError("null content")
    h = hashlib.md5(bytes(content).hex().encode()).hexdigest()
    return [int(h[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(dim)]


def decode_image(content: bytes, fake: bool = False) -> list[float]:
    if fake:
        return _fake_decode(content)
    raise NotImplementedError(
        "real image decoding requires PIL/libjpeg, not present in this environment; "
        "pass fake=True for the deterministic test decoder"
    )


def extract_features(media: DataFrame, batch_size: int = 256, fake: bool = True) -> DataFrame:
    """Distributed feature extraction via mapInPandas (Arrow batches).

    Each task consumes record batches; decode failures are captured
    per-row (ON_ERROR=CONTINUE spirit) instead of failing the task —
    at 100 TB a single corrupt blob must not kill the job."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "feature": [], "decode_ok": [], "error": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                try:
                    feat = decode_image(bytes(content) if content is not None else None, fake=fake)
                    out["feature"].append(feat)
                    out["decode_ok"].append(True)
                    out["error"].append(None)
                except Exception as e:  # noqa: BLE001 — per-row error capture
                    out["feature"].append(None)
                    out["decode_ok"].append(False)
                    out["error"].append(str(e)[:200])
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(_extract, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (decode stubbed; timestamps computed from metadata, JVM-side)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                # corrupt metadata must not kill the job: a NEGATIVE
                # duration makes sequence() raise (illegal boundaries)
                # and a NULL duration is unknown length — both emit
                # ZERO frames instead
                F.when(
                    F.col("meta.duration_ms") >= 0,
                    F.sequence(F.lit(0), F.col("meta.duration_ms"),
                               F.lit(every_ms)),
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("frame_ts_ms"),
        )
    )


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    for i in range(n):
        content = hashlib.sha256(f"media{i}".encode()).digest() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(content), ("application/octet-stream", 64, 64, 5000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
