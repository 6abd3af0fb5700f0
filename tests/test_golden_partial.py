"""Reference bm25query.slt replica (tests/sqllogictest/bm25query.slt:
20-46): partial indexes built over the id%2 subsets of the 10 fixed
passages carry their own subset N/avgdl/df — semantics a prefilter over
a full index does NOT reproduce — and must emit the reference's golden
orderings."""

from __future__ import annotations

from pyspark.sql import functions as F

from bm25spark.build import build_index
from bm25spark.config import Bm25Config
from bm25spark.golden import PASSAGES
from bm25spark.index import Bm25Index

GOLDEN = {0: [8, 4, 2], 1: [9, 1, 7]}  # bm25query.slt:29-46


def test_partial_index_golden_orderings(spark, tmp_path):
    df = spark.createDataFrame(PASSAGES, "doc_id INT, passage STRING")
    for parity, want in GOLDEN.items():
        d = str(tmp_path / f"partial{parity}")
        build_index(
            spark,
            df.filter(F.col("doc_id") % 2 == parity),
            d,
            "passage",
            ["doc_id"],
            cfg=Bm25Config(analyzer="english", shard_size=128),
        )
        got = [
            r.doc_id
            for r in Bm25Index(spark, d)
            .search_df("PostgreSQL", 10, round_score=None)
            .collect()
        ]
        assert got == want, (parity, got, want)


def test_partial_differs_from_prefiltered_full(spark, tmp_path):
    """The distinction users hit: a *prefilter* over the full index
    keeps full-corpus stats; a *partial build* re-derives them from the
    subset. Both must rank the even subset [8, 4, 2] here, but their
    scores must differ (full-index df/avgdl vs subset df/avgdl)."""
    from bm25spark.query import exact_topk

    df = spark.createDataFrame(PASSAGES, "doc_id INT, passage STRING")
    cfg = Bm25Config(analyzer="english", shard_size=128)
    sub = df.filter(F.col("doc_id") % 2 == 0)

    d = str(tmp_path / "partial_even")
    build_index(spark, sub, d, "passage", ["doc_id"], cfg=cfg)
    partial = {
        r.doc_id: r.score
        for r in Bm25Index(spark, d).search_df("PostgreSQL", 10).collect()
    }

    allow = sub.select("doc_id")
    pre = {
        r.doc_id: r.score
        for r in exact_topk(
            spark, df, "passage", "doc_id", "PostgreSQL", 10,
            cfg=cfg, prefilter=allow,
        ).collect()
    }
    assert sorted(partial) == sorted(pre) == [2, 4, 8]
    assert any(abs(partial[i] - pre[i]) > 1e-6 for i in partial)
