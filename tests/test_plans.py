"""Physical-plan regression guards for the claims in PLANS.md: the
exact scorer stays Python-free and heap-limited, scans prune columns,
and the LSH candidate join stays a broadcast hash join. If an innocent
refactor de-optimizes a plan, these fail before the benchmark does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_scorer_plan_is_codegen_and_heap_limited(spark, docs):
    from bm25spark.query import exact_topk

    plan = plan_of(exact_topk(spark, docs, "text", "doc_id", "merge spark", 10))
    # zero row-at-a-time or Arrow Python operators in the simple path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # global top-k is a per-partition heap + driver merge, not a sort
    assert "TakeOrderedAndProject" in plan
    # the 256-row quantization join broadcasts
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_exact_scorer_scan_prunes_columns(spark, docs):
    from bm25spark.query import exact_topk

    plan = plan_of(exact_topk(spark, docs, "text", "doc_id", "merge", 5))
    # documents.parquet has 5 columns; the scan must read only 2
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and all(
        "doc_id" in ln and "text" in ln and "lang" not in ln and "source" not in ln
        for ln in scan
    ), scan


def test_postings_read_prunes_partitions_and_pushes_keys(spark, tmp_path):
    from bm25spark.api import index_for_parquet

    idx = index_for_parquet(spark, f"{SF}/documents.parquet", "text", ["doc_id"])
    keys = idx.query_keys("merge spark")
    buckets = idx._buckets(keys)
    scan = idx.postings_df().filter(
        F.col("bucket").isin(buckets)
        & F.col("term_key").isin([bytearray(k) for k in keys])
    )
    plan = plan_of(scan)
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "PushedFilters" in plan and "term_key" in plan


def test_lsh_candidate_join_is_broadcast_hash(spark):
    from bm25spark.datapipe import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = plan_of(similarity.ann_lsh_topk(emb, bits=8, tables=4))
    # candidates come from a codegen broadcast hash equi-join on the
    # tagged bucket — never a nested-loop over the corpus
    assert "BroadcastHashJoin" in plan


def test_payload_join_broadcasts_topk_side(spark, tmp_path):
    from bm25spark.api import index_for_parquet
    from bm25spark.distributed import search_distributed

    idx = index_for_parquet(spark, f"{SF}/documents.parquet", "text", ["doc_id"])
    plan = plan_of(search_distributed(idx.spark, idx.index_dir, "merge", 5))
    assert "BroadcastHashJoin" in plan


def test_delta_batch_plan_broadcasts_and_single_python_crossing(spark, tmp_path):
    """Batched delta leg: per-query term weights join in via BROADCAST
    (never a shuffle of the delta on term_key), and the only Python
    operator in the whole batched growing∪sealed plan family is the
    fused Arrow tokenizer plus the per-shard kernel — no row-at-a-time
    Python anywhere."""
    from bm25spark.api import index_for_parquet
    from bm25spark.maintain import insert, search_with_delta_batch_df

    idx = index_for_parquet(spark, f"{SF}/documents.parquet", "text", ["doc_id"])
    insert(
        spark, idx.index_dir,
        spark.read.parquet(f"{SF}/documents.parquet").limit(20).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        ),
        "text",
    )
    plan = plan_of(
        search_with_delta_batch_df(
            spark, idx.index_dir, {"a": "merge spark", "b": "window"}, 5, "text"
        )
    )
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "BroadcastHashJoin" in plan    # q_terms + payload joins
    # exactly one Arrow tokenizer crossing in the delta leg, plus the
    # per-shard kernels (FlatMapGroupsInPandas / cogroup)
    assert plan.count("ArrowEvalPython") <= 1, plan.count("ArrowEvalPython")


def test_substring_spans_shuffle_carries_hash_not_gram(spark, docs):
    """The scale claim in dedup.substring_dup_spans: the 40-char gram
    is hashed to 8 bytes BEFORE the pair-count shuffle, so no string
    gram column ever crosses an Exchange; the groupBy gets a map-side
    partial aggregate; and the whole pipeline stays Python-free."""
    from bm25spark.datapipe import dedup

    plan = plan_of(dedup.substring_dup_spans(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # partial agg before the exchange (count_distinct partials)
    assert "partial_" in plan
    # every shuffle is keyed on the hash or doc_id — a plan that
    # shuffled `substring(...)` output would name the expression or a
    # gram alias in its hashpartitioning clause
    import re

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "substring" not in keys and "gram" not in keys, keys
    dedup.release_caches()
