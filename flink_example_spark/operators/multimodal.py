"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media lives in a BINARY column with a
typed metadata struct alongside; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages so each executor
processes whole record batches without JVM↔Python per-row overhead, and the
pipeline repartitions by size-balanced ranges before the expensive decode.

The actual codec calls are STUBBED (image/audio libraries are not in this
container): ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature vector
(seeded from the payload bytes) with the REAL schema, partitioning, UDF
signature, and batch shape — so the Spark-side plumbing is fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_n_bytes", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("meta_n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

MEDIA_TYPES = ("image", "audio", "video")


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the utf-8 text bytes
    stand in for an encoded payload; metadata is derived deterministically."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("doc_id") % 640 + 1).cast("int").alias("meta_width"),
        (F.col("doc_id") % 480 + 1).cast("int").alias("meta_height"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("meta_n_bytes"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes of
    sha256(payload || i) scaled to [0, 1)."""
    import hashlib

    out: list[float] = []
    i = 0
    while len(out) < dim:
        digest = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
        out.extend(b / 256.0 for b in digest)
        i += 1
    return out[:dim]


def decode_media(media: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Decode payloads into feature vectors via Arrow-batched mapInPandas.

    With ``fake=False`` this raises NotImplementedError at execution time —
    the real codecs (PIL/librosa/ffmpeg) are not available in this container.
    ``fake=True`` exercises the identical plumbing with deterministic fakes.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass fake=True to exercise the pipeline plumbing"
                )
            feats = [
                _fake_feature(bytes(p), dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "meta_n_bytes": pdf["meta_n_bytes"],
                    "feature": feats,
                }
            )

    # Size-balance partitions before the (real-world: expensive) decode so
    # stragglers don't dominate; at cluster scale this is the knob that keeps
    # 1000 executors busy.
    return media.repartition("media_type").mapInPandas(decode, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_chars", IntegerType(), True),
        StructField("frame_md5", StringType(), True),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads via Arrow-batched mapInPandas: emit
    up to ``n_frames`` evenly-spaced frames per video as (media_id,
    frame_idx, frame_chars, frame_md5) rows.

    Real codecs (ffmpeg keyframe extraction) are not in this container;
    ``fake=True`` slices the payload into ceil(len/n)-sized character spans
    — deterministic, so the emitted frame fingerprints are reproducible by
    any SQL engine (the driver oracle re-derives them with substr+md5).
    The Spark-side shape is the real one: video-only pushdown filter,
    size-balanced repartition, Arrow batches bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` so one huge payload
    batch can't blow executor memory.
    """
    import hashlib
    import math

    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs not available in this environment; "
                    "pass fake=True to exercise the pipeline plumbing"
                )
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                s = bytes(payload).decode("utf-8")
                step = math.ceil(len(s) / n_frames) if s else 1
                for i in range(n_frames):
                    frame = s[i * step : (i + 1) * step]
                    if not frame:
                        break
                    out.append(
                        (mid, i, len(frame), hashlib.md5(frame.encode()).hexdigest())
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return (
        media.filter(F.col("media_type") == "video")
        .repartition("media_id")
        .mapInPandas(sample, schema=FRAME_SCHEMA)
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation — stays entirely JVM-side."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta_n_bytes").alias("total_bytes"),
        F.max("meta_n_bytes").alias("max_bytes"),
    )
