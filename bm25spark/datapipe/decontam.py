"""Benchmark decontamination: flag training documents that share any
n-token shingle with a held-out evaluation set — the GPT-3 / Llama
pre-training hygiene step (Brown et al. 2020 §C uses 13-grams; the
default here matches). A training-data engine over the reference's
corpus tables needs this next to dedup: contaminated docs inflate eval
scores, and the scan shape is the same banded broadcast join the
engine already uses for MinHash candidates.

100-TB shape: eval benchmarks are tiny (thousands of docs), so the
benchmark shingle set is a DISTINCT over an exploded narrow projection
and is broadcast — the 100-TB training side is scanned once, exploded
map-side with per-doc `array_distinct` (no shuffle of raw grams
against other docs), hash-joined against the broadcast set inside
whole-stage codegen, and only the surviving (doc, gram) hits — a
vanishingly small fraction — reach the one per-doc aggregation
shuffle. Nothing is collected on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import spread_small_scan


def _doc_grams(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) with per-doc-DISTINCT space-joined n-token
    shingles under the simple analyzer. The token array is bound to a
    column attribute before the HOF lambdas touch it (enclosing
    expressions re-evaluate per element otherwise), and the
    `sequence` guard keeps short docs at an empty gram list —
    `sequence(1, 0)` would otherwise DESCEND ([1, 0])."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda s: s != ""
    )
    base = spread_small_scan(docs.filter(F.col("text").isNotNull())).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), toks.alias("_t")
    )
    m: Column = F.size("_t") - (n - 1)
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", F.slice(F.col("_t"), i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )


def decontaminate_ngrams(
    train: DataFrame, benchmark: DataFrame, n: int = 13
) -> DataFrame:
    """One row per non-NULL-text training doc: ``n_contaminated``
    (count of DISTINCT n-gram shingles also present anywhere in the
    benchmark), ``contaminated`` flag, and ``first_gram`` — the
    lexicographically smallest hit as a deterministic witness (NULL
    when clean). Both inputs are doc-shaped (``doc_id``, ``text``);
    shingling is the simple analyzer on both sides, so the match is
    tokenization-invariant to case/punctuation, as the published
    filters specify."""
    bench_grams = F.broadcast(
        _doc_grams(benchmark, n).select("gram").distinct()
    )
    hits = (
        _doc_grams(train, n)
        .join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_contaminated"),
            F.min("gram").alias("first_gram"),
        )
    )
    all_docs = train.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("bigint").alias("doc_id")
    )
    return (
        all_docs.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
            "first_gram",
        )
        .orderBy("doc_id")
    )


def decontaminate_ngrams_sql(
    n: int = 13, bench_pred: str = "doc_id % 97 = 0"
) -> str:
    """DuckDB oracle: the benchmark is the ``documents`` rows matching
    ``bench_pred`` and the training side is the complement — the same
    deterministic split the gate entry applies Spark-side."""
    return f"""
WITH base AS (
  SELECT doc_id::BIGINT AS doc_id, ({bench_pred}) AS is_bench,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT DISTINCT doc_id, is_bench,
         unnest(list_transform(range(1, greatest(len(t) - {n} + 2, 1)),
                               i -> array_to_string(t[i:i+{n}-1], ' '))) AS gram
  FROM base
),
bench AS (SELECT DISTINCT gram FROM g WHERE is_bench),
hits AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_contaminated,
         min(g.gram) AS first_gram
  FROM g JOIN bench USING (gram) WHERE NOT g.is_bench GROUP BY 1
)
SELECT b.doc_id,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       coalesce(h.n_contaminated, 0) > 0 AS contaminated,
       h.first_gram
FROM base b LEFT JOIN hits h USING (doc_id)
WHERE NOT b.is_bench
ORDER BY doc_id
"""
