"""Corpus/term statistics as declarative plans (SURVEY.md §2.4 A1-A3).

These are the aggregation operators the reference computes during
flush (crates/bm25/src/flush.rs:49-66 for N/Σdl, :74,111 for per-term
df) — here exposed as standalone DataFrame pipelines with matching
DuckDB oracles in :mod:`bm25spark.oracle`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .query import quantized_dl, tokenize_simple_sql


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, doc_len) for every non-null doc, zero-token docs kept."""
    docs = docs.filter(F.col(text_col).isNotNull())
    tf = tokenize_simple_sql(docs, text_col, id_col)
    dls = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(dls, "doc_id", "left")
        .fillna({"doc_len": 0})
    )


def corpus_stats(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row (n_docs, sum_dl, avgdl) — reference flush.rs:49-66."""
    return doc_lengths(docs, text_col, id_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("doc_len").cast("bigint").alias("sum_dl"),
        F.round(F.sum("doc_len") / F.count("*"), 4).alias("avgdl"),
    )


def term_df(
    spark: SparkSession,
    docs: DataFrame,
    limit: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-term document frequency + collection frequency, top by df.

    Map-side partial aggregation applies automatically (hash agg on
    (doc, token) then on token); no UDF anywhere.
    """
    docs = docs.filter(F.col(text_col).isNotNull())
    tf = tokenize_simple_sql(docs, text_col, id_col)
    return (
        tf.groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
        )
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(limit)
    )


def doc_fieldnorms(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, doc_len, qdl): the quantization every score uses."""
    dls = doc_lengths(docs, text_col, id_col)
    return (
        quantized_dl(spark, dls)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("doc_len").cast("bigint").alias("doc_len"),
            F.col("qdl").cast("bigint").alias("qdl"),
        )
        .orderBy("doc_id")
    )
