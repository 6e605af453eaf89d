"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct —
exactly how the reference treats its packed peak blobs (base64 →
``MzXMLTags.scala:297-327``): payload stays opaque until a vectorized kernel
decodes it. The Spark-side plumbing here is real and tested — schema, Arrow
batch shape over ``mapInPandas``, partition-preserving projection — while the
actual codec call is stubbed (no image/audio libs in this container):
``decode_stub=True`` computes a deterministic fake feature from the raw
bytes; ``decode_stub=False`` raises ``NotImplementedError`` where a real
pillow/ffmpeg call would go.

At 100 TB: payload columns dominate scan bytes, so every query that does not
need them must project them out *before* any shuffle (column pruning does
this for parquet scans; after a join, select early). ``featurize`` is
``mapInPandas`` so payload bytes never round-trip through the driver and
each Arrow batch bounds executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a media-shaped table from documents: utf-8 payload + metadata.

    Stands in for an image/audio table at test scale; the column shapes
    (binary payload, metadata struct) are the real contract."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.pmod(F.col("doc_id"), F.lit(640)).cast("int").alias("width"),
            F.pmod(F.col("doc_id"), F.lit(480)).cast("int").alias("height"),
        ).alias("meta"),
    )


def _fake_feature(buf: bytes, dim: int = 4) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: per-chunk
    byte means. Replace with the real decode (pillow/librosa) on a cluster."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if len(arr) == 0:
        return [0.0] * dim
    chunks = np.array_split(arr.astype(np.float64), dim)
    return [round(float(c.mean()) if len(c) else 0.0, 6) for c in chunks]


def featurize(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode / feature-extract payloads via ``mapInPandas``.

    Arrow-batched: each partition streams through pandas in bounded batches;
    payload bytes stay executor-side. The stub path is deterministic so tests
    and oracles can assert on it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode needs pillow/ffmpeg — not in this container"
                )
            feats = [
                _fake_feature(b) if b is not None else None for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
