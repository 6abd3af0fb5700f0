"""The end-to-end corpus preparation pipeline — the composition a
training-data build actually runs, assembled from the individually
oracle-proven operators in this package:

1. exact + near-duplicate removal (:func:`dedup.dedup_keep_canonical`
   — MinHash candidate graph → components → min-id keeper),
2. heuristic quality filtering (:func:`textstats.corpus_quality_filter`
   — length/digit/stopword/repetition/boilerplate rules),
3. benchmark decontamination (:func:`decontam.decontaminate_ngrams`
   — n-gram shingle overlap vs a held-out eval split),
4. deterministic split assignment (:func:`splits.split_assign`).

``prepare_corpus`` returns ONE row per input document carrying every
signal and the final verdict, so a user can audit *why* each doc was
kept or dropped (the same reasons-column convention as
``corpus_quality_filter``); ``clean_corpus`` is the materializer
(kept docs only, with their split).

Scale shape: each stage is the already-audited plan of its operator
(no new shuffles are introduced — the composition is doc_id equi-joins
that AQE co-partitions), and the verdict column is pure codegen.
Every stage's semantics are pinned by its own driver-gate entry, so
the composition needs no new oracle: it is a join of proven outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import decontam, dedup, splits, textstats


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
    split_weights=splits.DEFAULT_WEIGHTS,
    split_salt: str = splits.DEFAULT_SALT,
    dedup_max_iters: int = 20,
) -> DataFrame:
    """Audit frame: (doc_id, canonical_id, is_duplicate, quality_keep,
    quality_reasons, contaminated, split, keep) — one row per input
    doc, ``keep`` true iff the doc is its cluster's keeper AND passes
    the quality rules AND is not contaminated. ``benchmark`` defaults
    to None (decontamination skipped, ``contaminated`` false)."""
    canon = dedup.dedup_keep_canonical(docs, max_iters=dedup_max_iters)
    qf = textstats.corpus_quality_filter(docs).select(
        "doc_id",
        F.col("keep").alias("quality_keep"),
        F.col("reasons").alias("quality_reasons"),
    )
    base = (
        canon.select(
            "doc_id",
            "canonical_id",
            (~F.col("keep")).alias("is_duplicate"),
        )
        # LEFT join (r7 advice fix): the quality stages filter
        # text IS NOT NULL, so an inner join silently dropped
        # NULL-text docs from the audit frame, violating the
        # one-row-per-input-document contract. They re-enter here as
        # quality_keep=false with the explicit 'null_text' reason
        # (canonical_id/split already cover every doc).
        .join(qf, "doc_id", "left")
        .withColumn(
            "quality_keep", F.coalesce(F.col("quality_keep"), F.lit(False))
        )
        .withColumn(
            "quality_reasons",
            F.coalesce(F.col("quality_reasons"), F.lit("null_text")),
        )
    )
    if benchmark is not None:
        dc = decontam.decontaminate_ngrams(
            docs, benchmark, n=decontam_n
        ).select("doc_id", "contaminated")
        # decontaminate_ngrams drops NULL-text docs; they re-enter
        # clean (a NULL text cannot contain a benchmark shingle)
        base = base.join(dc, "doc_id", "left").withColumn(
            "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
        )
    else:
        base = base.withColumn("contaminated", F.lit(False))
    sp = splits.split_assign(
        docs, weights=split_weights, salt=split_salt
    ).select("doc_id", "split")
    return (
        base.join(sp, "doc_id")
        .select(
            "doc_id",
            "canonical_id",
            "is_duplicate",
            "quality_keep",
            "quality_reasons",
            "contaminated",
            "split",
            (
                ~F.col("is_duplicate")
                & F.col("quality_keep")
                & ~F.col("contaminated")
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def clean_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """The materialized training corpus: kept docs only, original
    columns plus their split assignment."""
    verdict = prepare_corpus(docs, benchmark=benchmark, **kwargs)
    kept = verdict.filter(F.col("keep")).select("doc_id", "split")
    return docs.join(kept, "doc_id").orderBy("doc_id")
