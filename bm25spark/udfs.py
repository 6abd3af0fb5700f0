"""Vectorized (Arrow-batched) pandas UDFs — the only Python/JVM
crossings in the engine. No per-row Python UDFs anywhere.

``doc_terms_udf`` fuses tokenize -> per-doc tf aggregation -> intern
into one batch UDF so a document crosses the boundary once and comes
back as an already-aggregated sparse vector (the reference's
``Document``: sorted (key, tf) pairs, crates/bm25/src/vector.rs:37-94;
tf merge semantics src/datatype/tsvector.rs:107-127).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)

from .analyze import analyze_document, get_analyzer

TERMS_TYPE = ArrayType(
    StructType(
        [
            StructField("key", BinaryType(), False),
            StructField("tf", IntegerType(), False),
        ]
    )
)


def doc_terms_udf(analyzer_name: str, seed: bytes):
    """pandas UDF: text column -> array<struct<key binary, tf int>>.

    The doc length is recoverable as aggregate(tf) and is computed
    JVM-side (see :func:`with_doc_terms`) to keep this UDF's output
    minimal.
    """
    analyzer = get_analyzer(analyzer_name)
    memo: dict[str, bytes] = {}

    @F.pandas_udf(TERMS_TYPE)
    def _analyze(texts: pd.Series) -> pd.Series:
        # worker-lifetime intern memo (Spark reuses Python workers);
        # bounded so a pathological vocabulary can't grow it forever
        if len(memo) > 2_000_000:
            memo.clear()
        out = []
        for text in texts:
            if text is None:
                out.append([])
                continue
            items, _ = analyze_document(text, analyzer, seed, memo)
            out.append(items)
        return pd.Series(out)

    return _analyze


def with_doc_terms(df, text_col: str, analyzer_name: str, seed: bytes):
    """Add ``terms`` (sparse doc vector) and ``doc_len`` columns.

    NULL text rows are dropped, matching the reference build's NULL
    skip (src/index/bm25/am/am_build.rs:713-724). doc_len = sum of tfs
    (vector.rs:76-83), computed with the JVM ``aggregate`` expression.
    """
    # asNondeterministic: the analyzer IS deterministic, but marking it
    # so forbids Catalyst from DUPLICATING the expression when two
    # downstream columns derive from `terms` (doc_len + the explode) —
    # without it the delta-scoring plans carried TWO ArrowEvalPython
    # nodes and tokenized every row twice (caught by the plan guard
    # tests/test_plans.py::test_delta_batch_plan_*)
    udf = doc_terms_udf(analyzer_name, seed).asNondeterministic()
    return (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("terms", udf(F.col(text_col)))
        .withColumn(
            "doc_len",
            F.aggregate(
                "terms", F.lit(0), lambda acc, x: acc + x["tf"]
            ).cast("int"),
        )
    )


def explode_mappings(df, doc_id_col: str = "doc_id"):
    """terms array -> exploded mappings rows (term_key, doc_id, tf),
    the reference's ``Mapping`` stream (crates/bm25/src/segment.rs:23-45).
    """
    return df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col("doc_len"),
        F.explode("terms").alias("t"),
    ).select(
        F.col("t.key").alias("term_key"),
        "doc_id",
        F.col("t.tf").alias("tf"),
        "doc_len",
    )
