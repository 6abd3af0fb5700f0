#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., extras...}

Workloads:
- index_build          build over $SPARK_GRAFT_SF_DIR/documents.parquet
- synth_build          build over a deterministic synthetic source-code
                       corpus (Zipf vocab, skewed terms) — the
                       scaling-relevant throughput number
- wand_q_*             indexed top-k latency (driver kernel) per query
- exact_q_multi        full exact-scorer Catalyst plan
- dedup_minhash_pairs / ann_cosine_topk / text_stats
                       training-data pipeline operators

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BM25SPARK_BENCH_SYNTH (synthetic corpus
rows, default 20000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth_n = int(os.environ.get("BM25SPARK_BENCH_SYNTH", "20000"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bm25spark.build import build_index
    from bm25spark.config import Bm25Config
    from bm25spark.datapipe import dedup, similarity, textstats
    from bm25spark.fixtures import synth_corpus
    from bm25spark.index import Bm25Index
    from bm25spark.query import exact_topk
    from bm25spark.session import get_spark

    spark = get_spark("bm25spark-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs_path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    work = "/tmp/bm25spark-bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    # ---- index build over the sf documents table ----
    # warm build compiles every stage's codegen once (one-time JVM
    # cost, ~7s, amortized to nothing on a real corpus); the measured
    # build is the steady-state per-build number
    build_index(spark, docs, f"{work}/idx_warm", "text", ["doc_id"])
    t0 = time.perf_counter()
    build_index(spark, docs, f"{work}/idx_docs", "text", ["doc_id"])
    queries["index_build"] = round(time.perf_counter() - t0, 3)
    extras["index_build_docs_per_sec"] = round(n_docs / queries["index_build"], 1)

    # ---- synthetic source-code corpus build (scaling headline) ----
    corpus_path = f"{work}/corpus.parquet"
    synth_corpus(spark, synth_n, partitions=cpus * 2).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    t0 = time.perf_counter()
    build_index(
        spark,
        corpus,
        f"{work}/idx_synth",
        "content",
        ["repo", "path", "commit"],
        cfg=Bm25Config(analyzer="code", shard_size=1 << 14),
    )
    queries["synth_build"] = round(time.perf_counter() - t0, 3)
    extras["synth_build_docs_per_sec"] = round(synth_n / queries["synth_build"], 1)

    # ---- indexed top-k latency (driver kernel over parquet postings) ----
    idx = Bm25Index(spark, f"{work}/idx_docs")
    idx.fieldnorms()  # warm the docs artifact once, like a resident server
    wand_queries = {
        "wand_q_multi": "merge spark window",
        "wand_q_hot": "the",
        "wand_q_rare": "vector",
        "wand_q_4term": "data table query batch",
    }
    idx.search("warm up", 10)
    lat = []
    for name, q in wand_queries.items():
        t0 = time.perf_counter()
        idx.search(q, 10, mode="taat")
        dt = time.perf_counter() - t0
        queries[name] = round(dt, 4)
        lat.append(dt)
    lat.sort()
    extras["wand_p50_sec"] = round(lat[len(lat) // 2], 4)
    extras["wand_qps"] = round(1.0 / extras["wand_p50_sec"], 1)

    # ---- sf1 like-for-like corpus (10x the sf dir, >=50k docs at the
    # driver's sf0.1): the reference's published QPS is trec-covid
    # (~171k docs, 28.38 QPS => ~35 ms); this is the comparable-scale
    # serving number. Corpus = sf docs replicated with offset ids —
    # preserves the term-frequency distribution exactly while scaling
    # df and posting lengths 10x. Generation cost is excluded from the
    # build timing.
    sf1_mult = int(os.environ.get("BM25SPARK_BENCH_SF1_MULT", "10"))
    if sf1_mult > 1:
        from pyspark.sql import functions as F

        reps = F.array(*[F.lit(i) for i in range(sf1_mult)])
        docs1 = (
            docs.withColumn("r", F.explode(reps))
            .select(
                (F.col("doc_id") + F.col("r") * F.lit(n_docs)).alias("doc_id"),
                "text",
            )
        )
        sf1_path = f"{work}/sf1.parquet"
        docs1.write.parquet(sf1_path)
        sf1 = spark.read.parquet(sf1_path)
        n1 = n_docs * sf1_mult
        t0 = time.perf_counter()
        build_index(
            spark, sf1, f"{work}/idx_sf1", "text", ["doc_id"],
            cfg=Bm25Config(shard_size=1 << 14),
        )
        queries["sf1_build"] = round(time.perf_counter() - t0, 3)
        extras["sf1_docs"] = n1
        extras["sf1_build_docs_per_sec"] = round(n1 / queries["sf1_build"], 1)

        idx1 = Bm25Index(spark, f"{work}/idx_sf1")
        idx1.fieldnorms()
        idx1.search("warm up", 10)
        lat1 = []
        for _ in range(5):
            for q in wand_queries.values():
                t0 = time.perf_counter()
                idx1.search(q, 10, mode="taat")
                lat1.append(time.perf_counter() - t0)
        lat1.sort()
        extras["sf1_wand_p50_sec"] = round(lat1[len(lat1) // 2], 4)
        extras["sf1_wand_p90_sec"] = round(lat1[(len(lat1) * 9) // 10], 4)
        extras["sf1_wand_qps"] = round(1.0 / extras["sf1_wand_p50_sec"], 1)
        queries["sf1_wand_batch20"] = round(sum(lat1), 3)

    # Steady-state measurement: run the identical query once to compile
    # its codegen, then drop every cached/persisted intermediate so the
    # measured run re-executes the full pipeline (Spark has no result
    # cache — only explicit persists survive, and clearCache drops
    # them). This is the resident-engine number; cold plan-compile cost
    # is a one-time constant, not a per-query throughput property.
    def steady(fn):
        fn()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    queries["exact_q_multi"] = steady(
        lambda: exact_topk(
            spark, docs, "text", "doc_id", "merge spark window", 10
        ).collect()
    )

    from bm25spark.distributed import search_distributed

    search_distributed(spark, f"{work}/idx_docs", "warm up", 10).collect()
    t0 = time.perf_counter()
    search_distributed(
        spark, f"{work}/idx_docs", "merge spark window", 10
    ).collect()
    queries["dist_q_multi"] = round(time.perf_counter() - t0, 3)

    # ---- growing∪sealed search (delta leg Catalyst + sealed leg
    # distributed, tombstones as a per-shard blocklist) ----
    from pyspark.sql import functions as F

    from bm25spark.maintain import delete, insert, search_with_delta_df

    insert(
        spark,
        f"{work}/idx_docs",
        docs.select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text")
        .limit(500),
        "text",
    )
    delete(
        spark,
        f"{work}/idx_docs",
        docs.select("doc_id").filter(F.col("doc_id") % 17 == 0),
    )
    search_with_delta_df(
        spark, f"{work}/idx_docs", "warm up", 10, "text"
    ).collect()
    t0 = time.perf_counter()
    search_with_delta_df(
        spark, f"{work}/idx_docs", "merge spark window", 10, "text"
    ).collect()
    queries["delta_q_multi"] = round(time.perf_counter() - t0, 3)

    # ---- training-data pipeline operators (steady-state, see above) ----
    queries["dedup_minhash_pairs"] = steady(
        lambda: dedup.minhash_candidate_pairs(docs).collect()
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries["ann_cosine_topk"] = steady(
        lambda: similarity.ann_cosine_topk(emb).collect()
    )

    queries["text_stats"] = steady(lambda: textstats.text_stats(docs).collect())

    out = {
        "metric": "bm25 index build + top-k query + datapipe wall time",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "n_docs": n_docs,
        "synth_docs": synth_n,
        **extras,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
