"""Multimodal column plumbing: opaque binary media columns with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so actual decoding is STUBBED
(:func:`decode_image` raises NotImplementedError) — but everything
Spark-side is real and tested: the schema, the batch shape, the UDF
signature, partition-preserving processing, and a deterministic fake
feature extractor (byte histogram + entropy) standing in for a real
decoder. Swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("media", BinaryType(), False),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_entropy", DoubleType(), False),
        StructField("histogram16", ArrayType(DoubleType()), False),
    ]
)


def decode_image(data: bytes) -> "np.ndarray":
    """STUB — real image decode needs a codec library not present in
    this environment. The Spark plumbing around it (schema, batching,
    partitioning) is real; replace this body with PIL/cv2 to go live.
    """
    raise NotImplementedError(
        "image decoding requires a codec library (PIL/cv2) not available "
        "in this environment; use extract_features for the wired-up "
        "deterministic feature path"
    )


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministically synthesize an opaque binary media column from
    the text (sha256-seeded), with typed metadata — the shape a real
    image/audio ingest produces."""
    return docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        F.to_binary(
            F.concat(F.sha2(F.col("text"), 256), F.sha2(F.concat(F.col("text"), F.lit("x")), 256)),
            F.lit("hex"),
        ).alias("media"),
    )


def extract_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary media: byte
    histogram (16 buckets) + entropy. Vectorized NumPy per batch —
    the exact execution shape a real decoder/feature-extractor uses
    (mapInPandas keeps partitioning; no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            blobs = pdf["media"].to_list()
            lens = np.array([len(b) for b in blobs], dtype=np.int64)
            # ONE bincount over (row, nibble) pairs for the whole Arrow
            # batch — no Python loop over rows (a real decoder is
            # per-blob by necessity; histogram math is not)
            flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
            row = np.repeat(np.arange(n, dtype=np.int64), lens)
            hist = (
                np.bincount(row * 16 + (flat >> 4), minlength=n * 16)
                .reshape(n, 16)
                .astype(np.float64)
            )
            p = hist / np.maximum(lens, 1).astype(np.float64)[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                logs = np.where(p > 0.0, np.log2(p, where=p > 0.0), 0.0)
            entropy = -(p * logs).sum(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": lens,
                    "byte_entropy": np.round(entropy, 6),
                    "histogram16": [r.tolist() for r in np.round(p, 6)],
                }
            )

    return media_df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands per-video rows into frame
    tasks (doc_id, frame_no) without decoding — the distribution
    pattern for a real frame extractor (explode keeps it narrow)."""
    n_frames = (F.length("media") / 64).cast("int")  # fake: 64 B per "frame"
    return (
        media_df.filter(F.col("media_type") == "video/mp4")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_no"),
        )
        .orderBy("doc_id", "frame_no")
    )
