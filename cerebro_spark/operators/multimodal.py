"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Driver-mandated extension.  The container has no image/audio decode libraries,
so the decode kernels are STUBBED (clearly marked) behind deterministic fakes —
but the Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partition sizing) is real and tested.

Scale design: binary payloads ride in their own column so column pruning keeps
metadata-only queries from reading bytes at all; decode fan-out uses
``mapInPandas`` (Arrow batches) with ``maxRecordsPerBatch`` bounding executor
memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    media_type: str = "image",
    fmt: str = "raw",
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (size-derived fake
    dims — deterministic; a real ingestor parses headers here)."""
    size = F.octet_length(F.col(payload_col))
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            (size % 1920).cast("int").alias("width"),
            (size % 1080).cast("int").alias("height"),
            (size * 10).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — real implementation needs an image library (PIL/cv2) not present
    in this container.  The Spark plumbing calls ``fake_image_features``
    instead; swap this in when the decode dependency exists."""
    raise NotImplementedError(
        "image decode requires PIL/cv2; use fake_image_features for plumbing"
    )


def fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: byte-bucket
    histogram (fraction of bytes per 256/dim-wide bucket)."""
    if not payload:
        return [0.0] * dim
    counts = [0] * dim
    width = 256 // dim
    for b in payload:
        counts[min(b // width, dim - 1)] += 1
    total = len(payload)
    return [c / total for c in counts]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    batch_limit: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The batch loop is the exact shape a real decoder plugs into (payload bytes
    in, fixed-width float vector out); ``batch_limit`` mirrors the
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bound a 100 TB run sets so
    a partition of large payloads can't blow executor memory.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    schema = f"`{id_col}` long, features array<double>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [
                    fake_image_features(p if p is not None else b"", dim)
                    for p in chunk[payload_col]
                ]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "features": feats,
                        "n_bytes": [
                            len(p) if p is not None else 0
                            for p in chunk[payload_col]
                        ],
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (video, frame_ts) without
    decoding — the explode is pure metadata, so the expensive decode joins
    against exactly the frames a downstream stage requests."""
    n_frames = (F.col(f"{meta_col}.duration_ms") / every_ms).cast("int")
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * every_ms,
            )
        ),
    )
