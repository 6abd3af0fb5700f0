"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (BM25 exact top-k over the
sf0.001 documents table). ``queries()`` maps operator names from
SURVEY.md §2 to (spark, sf_dir) callables; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each (generated from the same constants the
Spark pipelines use, see bm25spark/oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

FLAGSHIP_QUERY = "spark merge window"
FLAGSHIP_K = 10

_QUERY_SETS = {
    "q_multi": (["merge", "spark", "window"], 10),
    "q_single_hot": (["the"], 10),
    "q_single_rare": (["vector"], 10),
    "q_with_missing": (["merge", "zzzmissingterm"], 10),
    "q_k100": (["data", "table", "query"], 100),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    from bm25spark.query import exact_topk

    docs = _docs(spark, "/root/testdata/sf0.001")
    return exact_topk(spark, docs, "text", "doc_id", FLAGSHIP_QUERY, FLAGSHIP_K)


def _exact_q(tokens: list[str], k: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bm25spark.query import exact_topk

        return exact_topk(
            spark, _docs(spark, sf_dir), "text", "doc_id", " ".join(tokens), k
        )

    return run


def _wand_q(tokens: list[str], k: int):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bm25spark.api import wand_topk_df

        return wand_topk_df(
            spark,
            f"{sf_dir}/documents.parquet",
            "text",
            "doc_id",
            " ".join(tokens),
            k,
        )

    return run


def _both_paths_q(tokens: list[str], k: int):
    """Q3 (exact Catalyst scorer) and J2/Q1 (indexed WAND kernel) in
    ONE gate entry: both paths answer the same query and must agree
    with the single shared oracle row-for-row. Collapsing the former
    bm25_exact_*/bm25_wand_* pairs keeps the whole registry inside the
    driver's 50-entry CORRECTNESS recording window (round-5 overflowed
    it) without losing either code path's hash pin."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        def lab(df: DataFrame, p: str) -> DataFrame:
            return df.select(
                F.lit(p).alias("path"),
                F.col("doc_id").cast("bigint").alias("doc_id"),
                "score",
            )

        e = lab(_exact_q(tokens, k)(spark, sf_dir), "exact")
        w = lab(_wand_q(tokens, k)(spark, sf_dir), "wand")
        return e.unionByName(w).orderBy("path", F.desc("score"), "doc_id")

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bm25spark import stats

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    try:
        import bm25spark.api  # noqa: F401

        have_wand = True
    except ImportError:
        have_wand = False

    if have_wand:
        # ALL five query sets × both code paths in ONE labeled entry
        # (formerly bm25_q_multi/_single_hot/_single_rare/
        # _with_missing/_k100): every (qset, path) leg keeps its own
        # oracle pin inside the union, and the collapse frees driver
        # CORRECTNESS window slots for new operators
        def _q_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
            from pyspark.sql import functions as F

            legs = []
            for name, (tokens, k) in _QUERY_SETS.items():
                df = _both_paths_q(tokens, k)(spark, sf_dir)
                legs.append(df.select(F.lit(name).alias("qset"), "*"))
            u = legs[0]
            for df in legs[1:]:
                u = u.unionByName(df)
            return u.orderBy("qset", "path", F.desc("score"), "doc_id")

        out["bm25_q_suite"] = _q_suite
    else:
        for name, (tokens, k) in _QUERY_SETS.items():
            out[f"bm25_exact_{name}"] = _exact_q(tokens, k)

    if have_wand:

        def _dist_q_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
            """Single-query shard-parallel serving matrix in one entry
            (formerly bm25_dist_q_multi / _prefilter / _pruned):
            - plain: per-shard WAND tasks, global top-k
            - prefilter: P3 allowlist (fetcher.rs:180-216) — full-corpus
              statistics, candidates restricted before they count to k
            - pruned: prefilter + the θ-seeded exact decode pre-cut
              forced through the tasks (prune_min_bytes=0); pruning is
              a decode/IO saver, never a semantics change, so 'pruned'
              rows must equal 'prefilter' rows exactly."""
            from pyspark.sql import functions as F

            from bm25spark.api import index_for_parquet
            from bm25spark.distributed import search_distributed

            idx = index_for_parquet(
                spark, f"{sf_dir}/documents.parquet", "text", ["doc_id"]
            )
            allowed = (
                spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter(F.col("doc_id") % 2 == 0)
                .select("doc_id")
            )
            q = "merge spark window"

            def lab(df: DataFrame, m: str) -> DataFrame:
                return df.select(
                    F.lit(m).alias("mode"),
                    F.col("doc_id").cast("bigint").alias("doc_id"),
                    "score",
                )

            plain = search_distributed(spark, idx.index_dir, q, 10)
            pre = search_distributed(
                spark, idx.index_dir, q, 10, prefilter=allowed
            )
            pruned = search_distributed(
                spark, idx.index_dir, q, 10,
                prefilter=allowed, prune_min_bytes=0,
            )
            return (
                lab(plain, "plain")
                .unionByName(lab(pre, "prefilter"))
                .unionByName(lab(pruned, "pruned"))
                .orderBy("mode", F.desc("score"), "doc_id")
            )

        out["bm25_dist_q_modes"] = _dist_q_modes

        def _dist_batch_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
            """Batched serving matrix in one entry (formerly
            bm25_dist_batch / _batch_del / _batch_pruned):
            - plain: every _QUERY_SETS query answered by ONE Spark job
              (per-shard tasks decode each term once, run the kernel
              once per query)
            - tombstone: P4 in the batch path — every %5==0 payload
              key tombstoned via maintain.delete, routed through the
              same per-shard cogroup mask as the single-query path
              (the reference applies its deleted filter on every scan,
              bulkdelete.rs:20-112, search.rs:112-118); statistics
              stay sealed (full-corpus) until vacuum
            - tombstone_pruned: same index, batched union-of-keeps
              decode pre-cut forced (prune_blocks_batch with
              tombstones live) — must equal 'tombstone' exactly."""
            import tempfile

            from pyspark.sql import functions as F

            from bm25spark.api import index_for_parquet
            from bm25spark.build import build_index
            from bm25spark.config import Bm25Config
            from bm25spark.distributed import search_distributed_batch
            from bm25spark.maintain import _tombstones_df, delete

            docs = _docs(spark, sf_dir)
            qs = {
                name: " ".join(tokens)
                for name, (tokens, _) in _QUERY_SETS.items()
            }
            idx = index_for_parquet(
                spark, f"{sf_dir}/documents.parquet", "text", ["doc_id"]
            )
            d = tempfile.mkdtemp(prefix="bm25spark-batchdel-gate-")
            build_index(
                spark, docs, d, "text", ["doc_id"],
                cfg=Bm25Config(shard_size=1 << 14),
            )
            delete(
                spark, d, docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
            )
            blocked = _tombstones_df(spark, d)

            def lab(df: DataFrame, m: str) -> DataFrame:
                return df.select(
                    F.lit(m).alias("mode"),
                    "query_id",
                    F.col("doc_id").cast("bigint").alias("doc_id"),
                    "score",
                )

            plain = search_distributed_batch(spark, idx.index_dir, qs, 10)
            tomb = search_distributed_batch(spark, d, qs, 10, blocked=blocked)
            pruned = search_distributed_batch(
                spark, d, qs, 10, blocked=blocked, prune_min_bytes=0
            )
            return (
                lab(plain, "plain")
                .unionByName(lab(tomb, "tombstone"))
                .unionByName(lab(pruned, "tombstone_pruned"))
                .orderBy("mode", "query_id", F.desc("score"), "doc_id")
            )

        out["bm25_dist_batch_modes"] = _dist_batch_modes

    out["corpus_stats"] = lambda spark, sf: stats.corpus_stats(spark, _docs(spark, sf))
    out["term_df_top50"] = lambda spark, sf: stats.term_df(spark, _docs(spark, sf), 50)
    out["doc_fieldnorms"] = lambda spark, sf: stats.doc_fieldnorms(
        spark, _docs(spark, sf)
    )

    def _events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bm25spark.streaming import windowed_event_counts

        return windowed_event_counts(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).orderBy("win_start", "event_type")

    out["events_windowed_counts"] = _events_windowed

    def _golden_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The reference's own sqllogictest golden query (indexing.slt:
        30-41): english-analyzed BM25 over its 10 fixed passages,
        query 'PostgreSQL' — expected id order [8, 9, 4, 1, 7, 2]."""
        from pyspark.sql import functions as F

        from bm25spark.config import Bm25Config
        from bm25spark.golden import PASSAGES
        from bm25spark.query import exact_topk

        df = spark.createDataFrame(PASSAGES, "doc_id INT, passage STRING")
        res = exact_topk(
            spark, df, "passage", "doc_id", "PostgreSQL", 10,
            cfg=Bm25Config(analyzer="english"), round_score=None,
        )
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return res.select(
            F.row_number().over(w).alias("rank"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
        )

    out["bm25_golden_slt_passages"] = _golden_passages

    def _unicode_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Built-in ``unicode`` analyzer (CJK character bigrams +
        alphanumeric words — the self-contained analogue of the
        reference's jieba/lindera tokenizer configs, README.md:174-344)
        proven end to end: exact BM25 over the CJK micro-corpus,
        query 全文検索, against a DuckDB oracle that re-implements the
        bigram tokenization in SQL."""
        from bm25spark.config import Bm25Config
        from bm25spark.fixtures import CJK_PASSAGES
        from bm25spark.query import exact_topk

        df = spark.createDataFrame(CJK_PASSAGES, "doc_id INT, text STRING")
        return exact_topk(
            spark, df, "text", "doc_id", "全文検索", 5,
            cfg=Bm25Config(analyzer="unicode"),
        )

    out["bm25_unicode_cjk"] = _unicode_cjk

    def _wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
        """BERT-style WordPiece analyzer (the reference ecosystem's
        ``bert`` tokenizer preset, pg_tokenizer; README.md:49-56) end
        to end: exact BM25 over the gate corpus under a fixed subword
        vocabulary — multi-piece segmentations ('window' -> win
        ##dow), single-char fallbacks, and q/z words collapsing to
        [unk] all hit real corpus rows. The oracle re-implements the
        greedy longest-match walk as a recursive CTE."""
        from bm25spark.analyze import make_wordpiece_analyzer
        from bm25spark.config import Bm25Config
        from bm25spark.fixtures import WORDPIECE_GATE_VOCAB
        from bm25spark.query import exact_topk

        make_wordpiece_analyzer(WORDPIECE_GATE_VOCAB, name="gate_wordpiece")
        return exact_topk(
            spark, _docs(spark, sf_dir), "text", "doc_id",
            "merge spark window", 10,
            cfg=Bm25Config(analyzer="gate_wordpiece"),
        )

    out["bm25_wordpiece"] = _wordpiece

    def _custom_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Corpus-trained custom-model analyzer (the reference
        ecosystem's create_custom_model_tokenizer flow, pg_tokenizer;
        README.md:143-166): train a top-20 document-frequency
        vocabulary from the gate corpus itself, then search with OOV
        tokens dropped — 'spark' falls outside the top 20 here, so the
        query degrades to its in-vocabulary terms on both sides. The
        oracle performs the identical training in SQL."""
        from bm25spark.analyze import make_vocab_analyzer
        from bm25spark.api import train_corpus_vocab
        from bm25spark.config import Bm25Config
        from bm25spark.query import exact_topk

        docs = _docs(spark, sf_dir)
        vocab = train_corpus_vocab(docs, top_n=20)
        make_vocab_analyzer(vocab, name="gate_custom_vocab")
        return exact_topk(
            spark, docs, "text", "doc_id", "merge spark window", 10,
            cfg=Bm25Config(analyzer="gate_custom_vocab"),
        )

    out["bm25_custom_vocab"] = _custom_vocab

    def _inspect_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The reference's storage-introspection surface
        (``bm25_page_inspect``, sql/install/vchord_bm25--0.3.0.sql:
        117-124), re-expressed over the postings artifact: per-term
        block count and document frequency for the hottest raw-keyed
        terms. The oracle recomputes both from first principles —
        df per (token, shard) over the build's deterministic internal
        id assignment, blocks = ceil(per-shard df / 128) — so it
        verifies the PHYSICAL block layout from SQL."""
        import tempfile

        from pyspark.sql import functions as F

        from bm25spark.api import inspect_index
        from bm25spark.build import build_index
        from bm25spark.config import Bm25Config

        d = tempfile.mkdtemp(prefix="bm25spark-inspect-gate-")
        build_index(
            spark, _docs(spark, sf_dir), d, "text", ["doc_id"],
            cfg=Bm25Config(shard_size=1 << 14),
        )
        # raw_only drops hashed keys BEFORE the order/limit cut, so
        # parity cannot depend on where a hashed (>=16-byte) token
        # would rank — the oracle can only rank readable tokens
        return inspect_index(spark, d, limit=25, raw_only=True).select(
            "token", "n_blocks", "df"
        )

    out["bm25_inspect_storage"] = _inspect_storage

    def _tokenize_mappings(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The reference's tokenize()::bm25vector surface
        (README.md:54-56) in relational form: (doc_id, token, tf)."""
        from pyspark.sql import functions as F

        from bm25spark.api import tokenize_mappings_df

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return tokenize_mappings_df(docs).select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "token",
            F.col("tf").cast("bigint").alias("tf"),
        )

    out["bm25_tokenize_mappings"] = _tokenize_mappings

    _delta_index_memo: dict[str, str] = {}

    def _delta_mutated_index(spark: SparkSession, sf_dir: str) -> str:
        """Shared mutation sequence for the growing∪sealed entries:
        sealed index over doc_id%3!=0, insert the %3==0 docs as delta,
        delete every %7==0 key (tombstones sealed docs AND masks the
        earlier delta inserts), then re-insert the %21==0 docs — the
        re-inserted keys must be live again (sequenced tombstones).
        Statistics stay sealed-only (stale) until vacuum. Memoized per
        sf_dir: both delta entries read the identical mutated state, so
        one build serves the whole gate run."""
        import tempfile

        from pyspark.sql import functions as F

        from bm25spark.build import build_index
        from bm25spark.config import Bm25Config
        from bm25spark.maintain import delete, insert

        if sf_dir in _delta_index_memo:
            return _delta_index_memo[sf_dir]
        docs = _docs(spark, sf_dir)
        d = tempfile.mkdtemp(prefix="bm25spark-delta-gate-")
        build_index(
            spark,
            docs.filter(F.col("doc_id") % 3 != 0),
            d,
            "text",
            ["doc_id"],
            cfg=Bm25Config(shard_size=1 << 14),
        )
        insert(spark, d, docs.filter(F.col("doc_id") % 3 == 0), "text")
        delete(
            spark, d, docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        )
        insert(spark, d, docs.filter(F.col("doc_id") % 21 == 0), "text")
        _delta_index_memo[sf_dir] = d
        return d

    def _delta_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
        """O6/Q4 gate (formerly bm25_delta_search + bm25_delta_prefilter,
        one shared mutated index):
        - plain: growing∪sealed single-query search
        - prefilter: P3 composed with O6 — payload-key prefilter
          (doc_id %2 == 0) applied to BOTH segments; sealed stats stay
          whole-corpus, candidates restricted before they count to k."""
        from pyspark.sql import functions as F

        from bm25spark.maintain import search_with_delta_df

        d = _delta_mutated_index(spark, sf_dir)
        allowed = (
            _docs(spark, sf_dir)
            .filter(F.col("doc_id") % 2 == 0)
            .select("doc_id")
        )

        def lab(df: DataFrame, m: str) -> DataFrame:
            return df.select(
                F.lit(m).alias("mode"),
                F.col("doc_id").cast("bigint").alias("doc_id"),
                "score",
            )

        plain = search_with_delta_df(spark, d, "merge spark window", 100, "text")
        pre = search_with_delta_df(
            spark, d, "merge spark window", 100, "text", prefilter=allowed
        )
        return (
            lab(plain, "plain")
            .unionByName(lab(pre, "prefilter"))
            .orderBy("mode", F.desc("score"), "doc_id")
        )

    out["bm25_delta_modes"] = _delta_modes

    def _delta_batch_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Batched growing∪sealed serving matrix (formerly
        bm25_delta_batch + bm25_delta_batch_prefilter, one shared
        mutated index): ALL five query sets answered in one sealed
        batch job + one delta Catalyst plan per mode, the prefilter
        mode applying the payload-key allowlist (doc_id %2 == 0) to
        both legs of every query — the full serving matrix's last
        cells (batch × growing∪sealed × tombstone ± prefilter)."""
        from pyspark.sql import functions as F

        from bm25spark.maintain import search_with_delta_batch_df

        d = _delta_mutated_index(spark, sf_dir)
        allowed = (
            _docs(spark, sf_dir)
            .filter(F.col("doc_id") % 2 == 0)
            .select("doc_id")
        )
        qs = {
            name: " ".join(tokens)
            for name, (tokens, _) in _QUERY_SETS.items()
        }

        def lab(df: DataFrame, m: str) -> DataFrame:
            return df.select(
                F.lit(m).alias("mode"),
                "query_id",
                F.col("doc_id").cast("bigint").alias("doc_id"),
                "score",
            )

        plain = search_with_delta_batch_df(spark, d, qs, 20, "text")
        pre = search_with_delta_batch_df(
            spark, d, qs, 20, "text", prefilter=allowed
        )
        return (
            lab(plain, "plain")
            .unionByName(lab(pre, "prefilter"))
            .orderBy("mode", "query_id", F.desc("score"), "doc_id")
        )

    out["bm25_delta_batch_modes"] = _delta_batch_modes

    def _partial_index_slt(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The reference's second sqllogictest (bm25query.slt:20-46):
        two *partial* indexes built over the id%2 subsets of the 10
        passages — each subset build has its own N/avgdl/df (different
        from prefiltering a full index) — queried with 'PostgreSQL'.
        Expected orderings: even -> [8, 4, 2], odd -> [9, 1, 7]."""
        import tempfile

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from bm25spark.build import build_index
        from bm25spark.config import Bm25Config
        from bm25spark.golden import PASSAGES
        from bm25spark.index import Bm25Index

        df = spark.createDataFrame(PASSAGES, "doc_id INT, passage STRING")
        parts = []
        for parity in (0, 1):
            d = tempfile.mkdtemp(prefix=f"bm25spark-partial-{parity}-")
            build_index(
                spark,
                df.filter(F.col("doc_id") % 2 == parity),
                d,
                "passage",
                ["doc_id"],
                cfg=Bm25Config(analyzer="english", shard_size=128),
            )
            res = Bm25Index(spark, d).search_df(
                "PostgreSQL", 10, round_score=None
            )
            w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
            parts.append(
                res.select(
                    F.lit(parity).cast("int").alias("parity"),
                    F.row_number().over(w).alias("rank"),
                    F.col("doc_id").cast("bigint").alias("doc_id"),
                )
            )
        return parts[0].unionByName(parts[1]).orderBy("parity", "rank")

    out["bm25_partial_index_slt"] = _partial_index_slt

    def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
        from bm25spark.streaming import sessionize_events

        return sessionize_events(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        )

    out["sessionize_events"] = _sessionized

    try:
        from bm25spark.datapipe import registry as dp_registry

        out.update(dp_registry())
    except ImportError:
        pass
    # the driver records the first 50 registry entries: keep the
    # registry at <=50 (round-6 collapsed the redundant pairs) AND
    # front-load the entries that have not yet received a driver
    # CORRECTNESS row, so a future overflow can never hide them again
    _priority = [
        "ann_ivfpq_topk",
        "text_lm_perplexity",
        "text_split_assign",
        "bpe_train_merges",
        "bm25_q_suite",
        "dedup_substring_spans",
        "dedup_keep_canonical",
        "image_webp_features",
        "image_jpeg_features",
        "ann_cosine_topk",
        "ann_pq_topk",
        "text_decontaminate",
        "image_container_features",
        "bm25_dist_q_modes",
        "bm25_dist_batch_modes",
        "bm25_delta_modes",
        "bm25_delta_batch_modes",
    ]
    front = {k: out[k] for k in _priority if k in out}
    front.update((k, v) for k, v in out.items() if k not in front)
    return front


def oracle_sql() -> dict[str, str]:
    from bm25spark import oracle

    out: dict[str, str] = {}
    try:
        import bm25spark.api  # noqa: F401

        have_wand = True
    except ImportError:
        have_wand = False

    if have_wand:
        # one suite oracle: each query set's shared SQL appears twice
        # (exact + wand legs), labeled, in _QUERY_SETS iteration order
        parts = []
        for name, (tokens, k) in _QUERY_SETS.items():
            sql = oracle.bm25_topk_sql(tokens, k)
            for path in ("exact", "wand"):
                parts.append(
                    f"SELECT '{name}' AS qset, '{path}' AS path, "
                    f"doc_id, score FROM ({sql})"
                )
        out["bm25_q_suite"] = (
            "\nUNION ALL\n".join(parts)
            + "\nORDER BY qset, path, score DESC, doc_id"
        )
    else:
        for name, (tokens, k) in _QUERY_SETS.items():
            out[f"bm25_exact_{name}"] = oracle.bm25_topk_sql(tokens, k)

    if have_wand:
        toks, kk = _QUERY_SETS["q_multi"]
        # single-query serving matrix: plain = whole-corpus top-k;
        # prefilter = full-corpus stats, restricted candidates (the
        # sealed_pred/live_pred generator expresses exactly that);
        # pruned = forced decode pruning, a pure decode/IO saver with
        # identical semantics to prefilter
        _plain_sql = oracle.bm25_topk_sql(toks, 10)
        _pre_sql = oracle.bm25_delta_topk_sql(
            toks, 10, sealed_pred="TRUE", live_pred="((doc_id % 2) = 0)"
        )
        out["bm25_dist_q_modes"] = (
            f"SELECT 'plain' AS mode, doc_id, score FROM ({_plain_sql})\n"
            f"UNION ALL\nSELECT 'prefilter' AS mode, doc_id, score FROM ({_pre_sql})\n"
            f"UNION ALL\nSELECT 'pruned' AS mode, doc_id, score FROM ({_pre_sql})\n"
            "ORDER BY mode, score DESC, doc_id"
        )

        # batched serving matrix: per-query single oracles unioned per
        # mode; tombstone modes = sealed (full-corpus) stats, deleted
        # docs excluded from candidates; forced batch pruning changes
        # nothing semantically (same oracle rows as tombstone)
        def _batch_union(mode: str, sql_for) -> str:
            return "\nUNION ALL\n".join(
                f"SELECT '{mode}' AS mode, '{name}' AS query_id,"
                f" doc_id, score FROM (" + sql_for(tokens) + ")"
                for name, (tokens, _) in _QUERY_SETS.items()
            )

        def _del_sql(tokens: list[str]) -> str:
            return oracle.bm25_delta_topk_sql(
                tokens, 10, sealed_pred="TRUE",
                live_pred="((doc_id % 5) <> 0)",
            )

        out["bm25_dist_batch_modes"] = (
            _batch_union("plain", lambda t: oracle.bm25_topk_sql(t, 10))
            + "\nUNION ALL\n"
            + _batch_union("tombstone", _del_sql)
            + "\nUNION ALL\n"
            + _batch_union("tombstone_pruned", _del_sql)
            + "\nORDER BY mode, query_id, score DESC, doc_id"
        )

    out["bm25_tokenize_mappings"] = oracle.tokenize_mappings_sql()
    out["corpus_stats"] = oracle.corpus_stats_sql()
    out["term_df_top50"] = oracle.term_df_sql(50)
    out["doc_fieldnorms"] = oracle.doc_fieldnorm_sql()

    from bm25spark.streaming import windowed_event_counts_sql

    out["events_windowed_counts"] = (
        windowed_event_counts_sql() + " ORDER BY win_start, event_type"
    )

    # golden values copied verbatim from the reference's sqllogictest
    # (/root/reference/tests/sqllogictest/indexing.slt:30-41)
    out["bm25_golden_slt_passages"] = (
        "SELECT * FROM (VALUES (1, 8), (2, 9), (3, 4), (4, 1), (5, 7), (6, 2))"
        " AS t(rank, doc_id) ORDER BY rank"
    )

    from bm25spark.analyze import tokenize_unicode
    from bm25spark.fixtures import CJK_PASSAGES

    out["bm25_unicode_cjk"] = oracle.bm25_unicode_topk_sql(
        CJK_PASSAGES, tokenize_unicode("全文検索"), 5
    )

    from bm25spark.analyze import make_wordpiece_analyzer, tokenize_simple
    from bm25spark.fixtures import WORDPIECE_GATE_VOCAB

    # query pieces computed by the SAME analyzer at SQL-generation time
    _wp = make_wordpiece_analyzer(WORDPIECE_GATE_VOCAB)
    out["bm25_wordpiece"] = oracle.wordpiece_topk_sql(
        _wp("merge spark window"), 10, WORDPIECE_GATE_VOCAB
    )
    # raw (unfiltered) query tokens: the top-20 vocabulary filter is
    # applied inside the SQL, mirroring the Spark-side training
    out["bm25_inspect_storage"] = oracle.inspect_storage_sql(limit=25)
    out["bm25_custom_vocab"] = oracle.custom_vocab_topk_sql(
        tokenize_simple("merge spark window"), 10, top_n=20
    )

    # golden values copied verbatim from the reference's sqllogictest
    # (/root/reference/tests/sqllogictest/bm25query.slt:29-46): partial
    # index WHERE id%2=0 -> [8,4,2]; WHERE id%2=1 -> [9,1,7]
    out["bm25_partial_index_slt"] = (
        "SELECT * FROM (VALUES (0, 1, 8), (0, 2, 4), (0, 3, 2),"
        " (1, 1, 9), (1, 2, 1), (1, 3, 7))"
        " AS t(parity, rank, doc_id) ORDER BY parity, rank"
    )

    # growing∪sealed with stale sealed statistics; live set mirrors the
    # insert/delete/re-insert sequence in queries()["bm25_delta_search"]
    _DELTA_LIVE_PRED = (
        "(((doc_id % 3) <> 0 AND (doc_id % 7) <> 0)"
        " OR ((doc_id % 3) = 0 AND ((doc_id % 7) <> 0 OR (doc_id % 21) = 0)))"
    )
    _DELTA_PRE_PRED = f"({_DELTA_LIVE_PRED} AND (doc_id % 2) = 0)"
    # plain = growing∪sealed with stale sealed stats; prefilter = P3 ∘
    # O6, candidates further restricted to the prefilter's keys with
    # statistics unchanged
    _dm_plain = oracle.bm25_delta_topk_sql(
        ["merge", "spark", "window"], 100,
        sealed_pred="(doc_id % 3) <> 0", live_pred=_DELTA_LIVE_PRED,
    )
    _dm_pre = oracle.bm25_delta_topk_sql(
        ["merge", "spark", "window"], 100,
        sealed_pred="(doc_id % 3) <> 0", live_pred=_DELTA_PRE_PRED,
    )
    out["bm25_delta_modes"] = (
        f"SELECT 'plain' AS mode, doc_id, score FROM ({_dm_plain})\n"
        f"UNION ALL\nSELECT 'prefilter' AS mode, doc_id, score FROM ({_dm_pre})\n"
        "ORDER BY mode, score DESC, doc_id"
    )
    # batched growing∪sealed matrix: per-query oracles with the same
    # mutation predicates, unioned per mode — mirrors
    # queries()["bm25_delta_batch_modes"]
    out["bm25_delta_batch_modes"] = "\nUNION ALL\n".join(
        f"SELECT '{mode}' AS mode, '{name}' AS query_id, doc_id, score FROM ("
        + oracle.bm25_delta_topk_sql(
            tokens, 20,
            sealed_pred="(doc_id % 3) <> 0",
            live_pred=pred,
        )
        + ")"
        for mode, pred in (
            ("plain", _DELTA_LIVE_PRED), ("prefilter", _DELTA_PRE_PRED)
        )
        for name, (tokens, _) in _QUERY_SETS.items()
    ) + "\nORDER BY mode, query_id, score DESC, doc_id"

    from bm25spark.streaming import sessionize_events_sql

    out["sessionize_events"] = sessionize_events_sql()

    try:
        from bm25spark.datapipe import oracle_registry as dp_oracles

        out.update(dp_oracles())
    except ImportError:
        pass
    return out
