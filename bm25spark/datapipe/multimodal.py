"""Multimodal column plumbing: opaque binary media columns with typed
metadata, processed by Arrow-batched ``mapInPandas``.

AUDIO IS REAL: :func:`decode_audio` parses RIFF/WAVE containers with
the stdlib ``wave`` module and extracts PCM features (duration, sample
rate, energy, zero crossings) with NumPy — no external codec needed —
and :func:`synthesize_wav_media` writes genuine WAV containers, so the
writer→parser roundtrip is exercised end to end (and gate-checked
against a DuckDB oracle that recomputes the features from the PCM's
closed form).

Image/video decoding remains STUBBED (:func:`decode_image` raises
NotImplementedError — the container has no image codec library), but
everything Spark-side is real and tested: the schema, the batch shape,
the UDF signature, partition-preserving processing, and a
deterministic fake feature extractor (byte histogram + entropy)
standing in for a real decoder. Swapping in PIL/ffmpeg is a
one-function change.
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


# ------------------------------------------------------------- audio (REAL) --

#: synthesized-PCM parameters. The sample sequence has a closed form
#: (LCG-style mix of doc_id and sample index, int64-exact) so a SQL
#: oracle can regenerate the exact PCM and verify the decoded features
#: without parsing WAV bytes itself.
WAV_RATE = 8000
WAV_MIX_A = 2654435761  # Knuth multiplicative-hash constants
WAV_MIX_B = 2246822519


def _pcm_samples(doc_id: int, n: int) -> np.ndarray:
    """int16 PCM, sample i = ((doc_id*A + i*B) mod 2^16) - 2^15.
    All math in int64 (max ~2.7e14 ≪ 2^63), replicated verbatim in
    the DuckDB oracle."""
    i = np.arange(n, dtype=np.int64)
    return (
        (np.int64(doc_id) * WAV_MIX_A + i * WAV_MIX_B) % 65536 - 32768
    ).astype(np.int16)


def wav_frame_count(doc_id: int) -> int:
    return 64 + int(doc_id) % 192


def synthesize_wav(doc_id: int) -> bytes:
    """A genuine RIFF/WAVE container (PCM s16le mono, 8 kHz) written
    by the stdlib ``wave`` module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(_pcm_samples(doc_id, wav_frame_count(doc_id)).tobytes())
    return buf.getvalue()


def decode_audio(data: bytes) -> dict:
    """REAL audio decode: parse a RIFF/WAVE container (stdlib
    ``wave``), return PCM-derived features. Integer-exact outputs
    (duration floor-ms, energy as a sum of squares, sign-change zero
    crossings) so the values reproduce bit-identically in SQL."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth != 2:
        raise ValueError(f"only 16-bit PCM supported, got sampwidth={sampwidth}")
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    if n_channels > 1:  # average channels for the feature pass
        pcm = pcm.reshape(-1, n_channels).mean(axis=1).astype(np.int64)
    neg = pcm < 0
    return {
        "sample_rate": int(framerate),
        "n_channels": int(n_channels),
        "n_frames": int(n_frames),
        "duration_ms": int(n_frames) * 1000 // int(framerate),
        "energy": int(np.dot(pcm, pcm)),
        "zero_crossings": int(np.count_nonzero(neg[1:] != neg[:-1])),
    }


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("energy", LongType(), False),
        StructField("zero_crossings", LongType(), False),
    ]
)


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, media) with REAL WAV containers — the
    audio analogue of :func:`attach_fake_media`. Arrow-batched; the
    per-row loop is the container writer itself (inherently per-blob,
    like any real encoder)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": "audio/wav",
                    "media": [synthesize_wav(int(i)) for i in ids],
                }
            )

    return docs.select(F.col("doc_id").cast("long").alias("doc_id")).mapInPandas(
        run,
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("media_type", StringType(), False),
                StructField("media", BinaryType(), False),
            ]
        ),
    )


def audio_features(media_df: DataFrame) -> DataFrame:
    """Decode every ``audio/wav`` blob (REAL stdlib-wave parse) and
    emit PCM features. mapInPandas keeps partitioning — no shuffle;
    the per-blob loop is the decoder itself, feature math is NumPy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    **{
                        k: [f[k] for f in feats]
                        for k in (
                            "sample_rate", "n_channels", "n_frames",
                            "duration_ms", "energy", "zero_crossings",
                        )
                    },
                }
            )

    return (
        media_df.filter(F.col("media_type") == "audio/wav")
        .select("doc_id", "media")
        .mapInPandas(run, AUDIO_FEATURES_SCHEMA)
    )


def audio_wav_features_sql() -> str:
    """DuckDB oracle: regenerate the closed-form PCM per doc and
    compute the same integer features the WAV decode path produces —
    container write → stdlib parse → NumPy features must land on
    exactly these values."""
    return f"""
WITH params AS (
  SELECT doc_id::BIGINT AS doc_id, 64 + doc_id % 192 AS n
  FROM documents
),
samples AS (
  SELECT doc_id, n, unnest(range(n)) AS i FROM params
),
pcm AS (
  SELECT doc_id, n, i,
         ((doc_id * {WAV_MIX_A} + i * {WAV_MIX_B}) % 65536) - 32768 AS s
  FROM samples
),
lagged AS (
  SELECT doc_id, n, s,
         lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM pcm
)
SELECT doc_id,
       {WAV_RATE} AS sample_rate,
       1 AS n_channels,
       any_value(n)::BIGINT AS n_frames,
       (any_value(n) * 1000 // {WAV_RATE})::BIGINT AS duration_ms,
       sum(s * s)::BIGINT AS energy,
       count(*) FILTER (
         WHERE prev IS NOT NULL AND (prev < 0) <> (s < 0)
       )::BIGINT AS zero_crossings
FROM lagged
GROUP BY doc_id
ORDER BY doc_id
"""
