"""End-to-end exact scorer tests: the reference's own sqllogictest
golden orderings (SURVEY.md §5) and a DuckDB differential oracle on
the driver-provided documents table."""

from __future__ import annotations

import duckdb
import pytest

from bm25spark.config import Bm25Config
from bm25spark.oracle import bm25_topk_sql, corpus_stats_sql, term_df_sql
from bm25spark.query import exact_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def duck(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


class TestGoldenPassages:
    """Golden orderings from /root/reference/tests/sqllogictest/
    indexing.slt:30-41 — query 'PostgreSQL', english analyzer,
    top-k ids must be [8, 9, 4, 1, 7, 2]."""

    CFG = Bm25Config(analyzer="english")

    def test_indexing_slt_order(self, spark, passages_df):
        res = exact_topk(
            spark, passages_df, "passage", "doc_id", "PostgreSQL", 10,
            cfg=self.CFG, round_score=None,
        ).collect()
        assert [r.doc_id for r in res] == [8, 9, 4, 1, 7, 2]

    def test_partial_even_odd(self, spark, passages_df):
        # bm25query.slt:55-81 partial-index variants
        even = passages_df.filter("doc_id % 2 = 0")
        res = exact_topk(
            spark, even, "passage", "doc_id", "PostgreSQL", 10,
            cfg=self.CFG, round_score=None,
        ).collect()
        assert [r.doc_id for r in res] == [8, 4, 2]
        odd = passages_df.filter("doc_id % 2 = 1")
        res = exact_topk(
            spark, odd, "passage", "doc_id", "PostgreSQL", 10,
            cfg=self.CFG, round_score=None,
        ).collect()
        assert [r.doc_id for r in res] == [9, 1, 7]

    def test_prefilter_semantics(self, spark, passages_df):
        """prefilter.slt:28-60: limit=3, predicate 'even id'.
        Post-filter: top-3 then filter -> 2 rows. Prefilter: filter
        inside the k-loop -> 3 rows."""
        top3 = exact_topk(
            spark, passages_df, "passage", "doc_id", "PostgreSQL", 3,
            cfg=self.CFG, round_score=None,
        ).collect()
        post = [r.doc_id for r in top3 if r.doc_id % 2 == 0]
        assert len(post) == 2

        allowed = passages_df.filter("doc_id % 2 = 0").select("doc_id")
        pre = exact_topk(
            spark, passages_df, "passage", "doc_id", "PostgreSQL", 3,
            cfg=self.CFG, round_score=None, prefilter=allowed,
        ).collect()
        assert len(pre) == 3
        assert [r.doc_id for r in pre] == [8, 4, 2]

    def test_limit_fallback(self, spark, passages_df):
        # fallback_parameter.slt:24-71: k=2 -> [8,9]; k=3 -> [8,9,4]
        res = exact_topk(
            spark, passages_df, "passage", "doc_id", "PostgreSQL", 2,
            cfg=self.CFG, round_score=None,
        ).collect()
        assert [r.doc_id for r in res] == [8, 9]
        res = exact_topk(
            spark, passages_df, "passage", "doc_id", "PostgreSQL", 3,
            cfg=self.CFG, round_score=None,
        ).collect()
        assert [r.doc_id for r in res] == [8, 9, 4]


class TestDuckDBOracle:
    def test_topk_matches(self, spark, docs):
        tokens = ["merge", "spark", "window"]
        got = exact_topk(
            spark, docs, "text", "doc_id", " ".join(tokens), 20
        ).collect()
        want = duck(bm25_topk_sql(tokens, 20))
        assert [(r.doc_id, r.score) for r in got] == [
            (d, s) for d, s in want
        ]

    def test_missing_term_skipped(self, spark, docs):
        got = exact_topk(
            spark, docs, "text", "doc_id", "merge zzznotaterm", 5
        ).collect()
        want = duck(bm25_topk_sql(["merge", "zzznotaterm"], 5))
        assert [(r.doc_id, r.score) for r in got] == [(d, s) for d, s in want]

    def test_all_missing_empty(self, spark, docs):
        got = exact_topk(spark, docs, "text", "doc_id", "zzz qqq", 5).collect()
        assert got == []

    def test_wide_query_path_matches_oracle(self, spark, docs):
        """The explode-join form used above WIDE_QUERY_TERMS (where the
        per-term pivot would compile a 1000-expression projection):
        same DuckDB oracle, and the auto-routing threshold engages."""
        from bm25spark.oracle import term_df_sql
        from bm25spark.query import WIDE_QUERY_TERMS, exact_topk_wide

        # all real corpus tokens (the synthetic vocab is ~31 terms)
        # padded with absent terms -> a wide query that also exercises
        # the df=0 skip
        toks = [t for (t, _, _) in duck(term_df_sql(200))]
        toks += [f"zzabsent{i}" for i in range(80 - len(toks))]
        assert len(toks) > WIDE_QUERY_TERMS
        q = " ".join(toks)
        got = exact_topk(spark, docs, "text", "doc_id", q, 30).collect()
        want = duck(bm25_topk_sql(toks, 30))
        assert [(r.doc_id, r.score) for r in got] == [(d, s) for d, s in want]
        # the narrow pivot (forced) and the wide form agree exactly
        wide = exact_topk_wide(
            spark, docs, "text", "doc_id", " ".join(toks[:10]), 30
        ).collect()
        narrow = exact_topk(
            spark, docs, "text", "doc_id", " ".join(toks[:10]), 30
        ).collect()
        assert [tuple(r) for r in wide] == [tuple(r) for r in narrow]
        # prefilter passes through the wide path too
        from pyspark.sql import functions as F

        allow = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
        wide_f = exact_topk_wide(
            spark, docs, "text", "doc_id", " ".join(toks[:10]), 30,
            prefilter=allow,
        ).collect()
        narrow_f = exact_topk(
            spark, docs, "text", "doc_id", " ".join(toks[:10]), 30,
            prefilter=allow,
        ).collect()
        assert wide_f and all(r.doc_id % 2 == 0 for r in wide_f)
        assert [tuple(r) for r in wide_f] == [tuple(r) for r in narrow_f]

    def test_no_cache_growth_across_queries(self, spark, docs):
        """Sequential exact queries must not accumulate persisted
        frames: each call's per-doc frame is tracked and dropped by the
        next call (release_caches drains explicitly)."""
        from bm25spark.query import release_caches

        def n_persisted() -> int:
            return len(
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
            )

        release_caches()
        base = n_persisted()
        for q in ["merge", "spark window", "data", "query merge", "table"]:
            exact_topk(spark, docs, "text", "doc_id", q, 5).collect()
            assert n_persisted() <= base + 1  # only the live query's frame
        release_caches()
        assert n_persisted() <= base

    def test_stats(self, spark, docs):
        from bm25spark.stats import corpus_stats, term_df

        got = corpus_stats(spark, docs).collect()[0]
        want = duck(corpus_stats_sql())[0]
        assert (got.n_docs, got.sum_dl, got.avgdl) == want

        got = [(r.token, r.df, r.cf) for r in term_df(spark, docs, 20).collect()]
        want = duck(term_df_sql(20))
        assert got == want


class TestTokenizerBatchParity:
    """The r7 arrow_udf tokenizer's vectorized batch kernel must be
    value-identical to analyze_document for EVERY analyzer — same
    tokens, same interned keys, items sorted by key bytes, saturating
    tf and doc_len, NULL text dropped upstream."""

    CASES = {
        "simple": [
            (1, "Héllo WORLD 123 héllo"), (2, None), (3, ""),
            (4, "ü" * 3 + " abc abc"), (5, "日本語 test 日本語"),
            (6, "a " * 50),
        ],
        "code": [
            (1, "def fooBar(x): return x_y + 12abc"),
            (2, "CamelCaseHTTPServer_2 snake_case"), (3, None),
        ],
        "english": [
            (1, "The quick-witted foxes are running-shoes stores"),
            (2, "connection connected connects"),
        ],
        "unicode": [
            (1, "全文検索エンジン test 123"), (2, "machine learning データ"),
        ],
    }

    @pytest.mark.parametrize("analyzer", sorted(CASES))
    def test_matches_analyze_document(self, spark, analyzer):
        from bm25spark.analyze import analyze_document, get_analyzer
        from bm25spark.udfs import with_doc_terms

        cfg = Bm25Config()
        rows = self.CASES[analyzer]
        an = get_analyzer(analyzer)
        memo: dict = {}
        want = {
            i: analyze_document(t, an, cfg.seed, memo)
            for i, t in rows
            if t is not None
        }
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {
            r.doc_id: (
                [(bytes(x["key"]), x["tf"]) for x in r.terms],
                r.doc_len,
            )
            for r in with_doc_terms(df, "text", analyzer, cfg.seed).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k] == (list(want[k][0]), want[k][1])
