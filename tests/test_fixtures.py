"""Synthetic corpus generator invariants: identical content at any
partitioning (per-row Philox streams), Zipf head skew present."""

from __future__ import annotations

from pyspark.sql import functions as F

from bm25spark.fixtures import synth_corpus


class TestSynthCorpus:
    def test_partition_independence(self, spark):
        a = synth_corpus(spark, 300, partitions=2).orderBy("repo", "path", "commit")
        b = synth_corpus(spark, 300, partitions=13).orderBy("repo", "path", "commit")
        ra = [tuple(r) for r in a.collect()]
        rb = [tuple(r) for r in b.collect()]
        assert ra == rb

    def test_schema_is_north_star_input(self, spark):
        df = synth_corpus(spark, 10)
        assert df.columns == ["repo", "path", "commit", "lang", "content"]
        assert dict(df.dtypes) == {c: "string" for c in df.columns}

    def test_zipf_skew(self, spark):
        df = synth_corpus(spark, 500)
        tf = (
            df.select(F.explode(F.split("content", " ")).alias("t"))
            .groupBy("t")
            .count()
            .orderBy(F.desc("count"))
            .limit(200)
            .collect()
        )
        # head term dominates the 100th term by a wide margin
        assert tf[0]["count"] > 20 * tf[99]["count"]

    def test_key_uniqueness(self, spark):
        df = synth_corpus(spark, 400)
        assert df.select("repo", "path", "commit").distinct().count() == 400
