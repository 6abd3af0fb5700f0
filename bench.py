#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "noise": {name: ratio}, extras...}

Self-defending timing (round-3): every leg runs BM25SPARK_BENCH_REPEATS
times (default 3) and reports the MIN — the number least contaminated
by co-tenant VM load — plus a per-leg ``noise`` ratio (max/min). A
noisy machine shows up as noise >> 1 instead of silently inflating the
scoreboard (round 2's driver run recorded a phantom 5x regression that
an idle-VM rerun of the identical script could not reproduce).

Workloads:
- index_build          build over $SPARK_GRAFT_SF_DIR/documents.parquet
- synth_build          build over a deterministic synthetic source-code
                       corpus (Zipf vocab, skewed terms) — the
                       scaling-relevant throughput number
- wand_q_*             indexed top-k latency (driver kernel) per query
- sf1_* / sf34_*       likes-for-like serving scale: the sf corpus
                       replicated 10x (~50k docs) and 34x (~170k docs,
                       the reference's trec-covid scale: 28.38 QPS =>
                       ~35 ms p50, /root/reference/README.md:385-402)
- exact_q_multi        full exact-scorer Catalyst plan
- dedup_minhash_pairs / ann_cosine_topk / ann_pq_topk / text_stats /
  dedup_substring_spans / bpe_train16
                       training-data pipeline operators

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BM25SPARK_BENCH_SYNTH (synthetic corpus
rows, default 20000), BM25SPARK_BENCH_REPEATS (default 3),
BM25SPARK_BENCH_SF1_MULT (default 10), BM25SPARK_BENCH_SF34_MULT
(default 34; 0 disables the trec-covid-scale section),
BM25SPARK_BENCH_CONTROLS (default 0; 1 enables the diagnostic
decoded-fraction controls — instruments, excluded from driver runs).
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
    repeats = max(1, int(os.environ.get("BM25SPARK_BENCH_REPEATS", "3")))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from bm25spark.build import build_index
    from bm25spark.config import Bm25Config
    from bm25spark.datapipe import dedup, similarity, textstats
    from bm25spark.fixtures import synth_corpus
    from bm25spark.index import Bm25Index
    from bm25spark.query import exact_topk, release_caches
    from bm25spark.session import get_spark

    spark = get_spark("bm25spark-bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs_path = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()

    queries: dict[str, float] = {}
    noise: dict[str, float] = {}
    extras: dict[str, float] = {}
    work = "/tmp/bm25spark-bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    def record(name: str, samples: list[float], digits: int = 4) -> None:
        queries[name] = round(min(samples), digits)
        noise[name] = round(max(samples) / max(min(samples), 1e-9), 2)

    # ---- scoped cache release: drop only persisted frames created
    # since the snapshot (NOT spark.catalog.clearCache(), which nukes
    # every persist in the session), so each measured run re-executes
    # its full pipeline without steady() interfering with anything the
    # surrounding code keeps cached.
    def _persisted_ids() -> set:
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}
        except Exception:
            return set()

    def _release_since(before: set) -> None:
        release_caches()  # exact_topk's tracked per-doc frame
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for k in jmap.keySet().toArray():
                if int(k) not in before:
                    jmap.get(k).unpersist()
        except Exception:
            spark.catalog.clearCache()  # fallback: coarse but safe here

    def steady(name: str, fn) -> None:
        """Warm once (codegen compile), then ``repeats`` full
        re-executions with the operator's own persists dropped in
        between; min + noise recorded."""
        before = _persisted_ids()
        fn()
        samples = []
        for _ in range(repeats):
            _release_since(before)
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        _release_since(before)
        record(name, samples, digits=3)

    # ---- index build over the sf documents table ----
    # warm build compiles every stage's codegen once (one-time JVM
    # cost, amortized to nothing on a real corpus); each measured
    # build is a full fresh build into its own dir
    build_index(spark, docs, f"{work}/idx_warm", "text", ["doc_id"])
    samples = []
    for i in range(repeats):
        t0 = time.perf_counter()
        build_index(spark, docs, f"{work}/idx_docs_{i}", "text", ["doc_id"])
        samples.append(time.perf_counter() - t0)
    record("index_build", samples, digits=3)
    extras["index_build_docs_per_sec"] = round(n_docs / queries["index_build"], 1)
    idx_docs_dir = f"{work}/idx_docs_0"

    # ---- synthetic source-code corpus build (scaling headline) ----
    corpus_path = f"{work}/corpus.parquet"
    synth_corpus(spark, synth_n, partitions=cpus * 2).write.parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    samples = []
    for i in range(repeats):
        t0 = time.perf_counter()
        build_index(
            spark,
            corpus,
            f"{work}/idx_synth_{i}",
            "content",
            ["repo", "path", "commit"],
            cfg=Bm25Config(analyzer="code", shard_size=1 << 14),
        )
        samples.append(time.perf_counter() - t0)
        shutil.rmtree(f"{work}/idx_synth_{i}", ignore_errors=True)
    record("synth_build", samples, digits=3)
    extras["synth_build_docs_per_sec"] = round(synth_n / queries["synth_build"], 1)

    # ---- indexed top-k latency (driver kernel over parquet postings) ----
    idx = Bm25Index(spark, idx_docs_dir)
    idx.fieldnorms()  # warm the docs artifact once, like a resident server
    wand_queries = {
        "wand_q_multi": "merge spark window",
        "wand_q_hot": "the",
        "wand_q_rare": "vector",
        "wand_q_4term": "data table query batch",
    }
    idx.search("warm up", 10)
    for name, q in wand_queries.items():
        idx.search(q, 10, mode="taat")  # cold Arrow read paid here
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            idx.search(q, 10, mode="taat")
            samples.append(time.perf_counter() - t0)
        record(name, samples)  # warm (resident-server) latency + true run noise
    lat = sorted(queries[n] for n in wand_queries)
    extras["wand_p50_sec"] = round(lat[len(lat) // 2], 4)
    extras["wand_qps"] = round(1.0 / extras["wand_p50_sec"], 1)

    # ---- replicated like-for-like serving corpora. The reference's
    # published QPS is trec-covid (~171k docs, 28.38 QPS => ~35 ms);
    # sf34 (34x the sf0.1 docs = ~170k) is the equal-scale serving row,
    # sf1 (10x = ~50k) is the round-over-round comparable. Replication
    # with offset ids preserves the term-frequency distribution exactly
    # while scaling df and posting lengths; generation cost is excluded
    # from the build timing.
    def replicated(mult: int, path: str):
        reps = F.array(*[F.lit(i) for i in range(mult)])
        (
            docs.withColumn("r", F.explode(reps))
            .select(
                (F.col("doc_id") + F.col("r") * F.lit(n_docs)).alias("doc_id"),
                "text",
            )
            .write.parquet(path)
        )
        return spark.read.parquet(path)

    def serve_scaled(tag: str, mult: int, build_repeats: int) -> None:
        big = replicated(mult, f"{work}/{tag}.parquet")
        n_big = n_docs * mult
        samples = []
        for i in range(build_repeats):
            t0 = time.perf_counter()
            build_index(
                spark, big, f"{work}/idx_{tag}_{i}", "text", ["doc_id"],
                cfg=Bm25Config(shard_size=1 << 14),
            )
            samples.append(time.perf_counter() - t0)
            if i:
                shutil.rmtree(f"{work}/idx_{tag}_{i}", ignore_errors=True)
        record(f"{tag}_build", samples, digits=3)
        extras[f"{tag}_docs"] = n_big
        extras[f"{tag}_build_docs_per_sec"] = round(
            n_big / queries[f"{tag}_build"], 1
        )

        bidx = Bm25Index(spark, f"{work}/idx_{tag}_0")
        bidx.fieldnorms()
        # cold (first-touch) latencies: each query's first search pays
        # the Arrow dictionary/postings read — measured separately
        # instead of polluting the warm percentiles
        cold = []
        for q in wand_queries.values():
            t0 = time.perf_counter()
            bidx.search(q, 10, mode="taat")
            cold.append(time.perf_counter() - t0)
        cold.sort()
        extras[f"{tag}_wand_cold_p90_sec"] = round(
            cold[(len(cold) * 9) // 10], 4
        )
        lat_all = []
        for _ in range(max(repeats, 5)):
            for q in wand_queries.values():
                t0 = time.perf_counter()
                bidx.search(q, 10, mode="taat")
                lat_all.append(time.perf_counter() - t0)
        lat_all.sort()
        extras[f"{tag}_wand_p50_sec"] = round(lat_all[len(lat_all) // 2], 4)
        extras[f"{tag}_wand_p90_sec"] = round(
            lat_all[(len(lat_all) * 9) // 10], 4
        )
        extras[f"{tag}_wand_qps"] = round(
            1.0 / extras[f"{tag}_wand_p50_sec"], 1
        )
        queries[f"{tag}_wand_batch"] = round(sum(lat_all), 3)
        # warm() API: a FRESH index instance pre-warmed on the query
        # set — its first-touch percentile should match the warm p90,
        # not the cold one (the resident-server cold-start fix)
        b2 = Bm25Index(spark, f"{work}/idx_{tag}_0")
        b2.warm(wand_queries.values())
        first = []
        for q in wand_queries.values():
            t0 = time.perf_counter()
            b2.search(q, 10, mode="taat")
            first.append(time.perf_counter() - t0)
        first.sort()
        extras[f"{tag}_wand_warmed_first_p90_sec"] = round(
            first[(len(first) * 9) // 10], 4
        )

        # decode-pruning effectiveness (the distributed per-shard
        # pre-cut, wand.prune_blocks): fraction of packed posting
        # bytes that must be decompressed for the k_fetch=138 cut the
        # serving path uses — measured on the same postings the shard
        # tasks see (here unsharded, a conservative proxy: per-shard
        # θ's are ≥ as selective at equal k)
        from bm25spark.wand import prune_blocks

        fns_arr = bidx.fieldnorms()
        for pq, q in (("hot", "the"), ("multi", "merge spark window")):
            tps = bidx.term_postings(q)
            for t in tps:
                t.decoded = None  # measure a cold decode, not the memo
            _, st = prune_blocks(tps, fns_arr, 138)
            for t in tps:
                t.decoded = None  # drop control-materialized arrays
            if st["bytes_total"]:
                extras[f"{tag}_prune_decoded_frac_{pq}"] = round(
                    st["bytes_kept"] / st["bytes_total"], 3
                )
        # ---- diagnostic decode controls (BM25SPARK_BENCH_CONTROLS=1;
        # DEFAULT OFF). Round-5's driver run recorded a consistent
        # slowdown on every leg downstream of these in-driver controls
        # (exact_q_multi 0.86->6.34 s) that idle-box reruns of the same
        # code could not reproduce; they are measurement instruments,
        # not workloads, so they must never be able to contaminate the
        # scoreboard. When enabled they now also restore every wrapped
        # decode fn and drop every decoded array they materialized.
        if os.environ.get("BM25SPARK_BENCH_CONTROLS", "0") == "1":
            # batched pre-cut (prune_blocks_batch): fraction of packed
            # bytes the batch path decodes for ALL wand queries
            # together — the union of per-query keeps, decoded once
            # via the shared cache (r4 decoded 100% here by design)
            from bm25spark.wand import prune_blocks_batch

            term_map, qt = {}, {}
            for name, q in wand_queries.items():
                keys = bidx.query_keys(q)
                stats_q = bidx.term_stats(keys)
                present = [kk for kk in keys if kk in stats_q]
                for kk, tp in zip(present, bidx.term_postings(q)):
                    tp.decoded = None
                    term_map.setdefault(kk, tp)
                qt[name] = present
            _, stb = prune_blocks_batch(term_map, qt, fns_arr, 138)
            if stb["bytes_total"]:
                extras[f"{tag}_prune_decoded_frac_batch"] = round(
                    stb["bytes_kept"] / stb["bytes_total"], 3
                )
            for tp in term_map.values():
                tp.decoded = None
            term_map.clear()
            # DYNAMIC skipping control: the reference's own scheme is
            # block-max WAND with runtime θ (search.rs:243-279) — run
            # our faithful bmw_topk on the same queries and count
            # which blocks its cursors actually decompress (a _Cursor
            # decodes only on _fill; seek_block skips without touching
            # bytes). Where the static θ-seeded pre-cut reports frac
            # 1.0 (uniform-ub corpora), this shows whether DYNAMIC
            # pruning would have done better — i.e. whether the
            # boundary is the scheme or the corpus.
            from bm25spark.wand import bmw_topk

            for pq, q in (("hot", "the"), ("multi", "merge spark window")):
                tps = bidx.term_postings(q)
                origs = []
                touched = [0]
                total = 0
                for t in tps:
                    t.decoded = None
                    total += sum(
                        len(a) + len(bb)
                        for a, bb in zip(t.ids_bytes, t.tfs_bytes)
                    )
                    origs.append((t, t.decode))

                    def _wrap(t=t, seen=set(), orig=None):
                        orig = t.decode

                        def f(i, t=t, seen=seen, orig=orig):
                            if i not in seen:
                                seen.add(i)
                                touched[0] += len(t.ids_bytes[i]) + len(
                                    t.tfs_bytes[i]
                                )
                            return orig(i)

                        t.decode = f

                    _wrap()
                bmw_topk(tps, fns_arr, 138)
                for t, orig in origs:
                    t.decode = orig
                    t.decoded = None
                if total:
                    extras[f"{tag}_bmw_decoded_frac_{pq}"] = round(
                        touched[0] / total, 3
                    )
            # the serving index (and its postings/decoded caches) is
            # scoped to this function; drop it eagerly so no control
            # state survives into downstream legs
            bidx._postings_cache.clear()
            bidx._decoded_cache.clear()
            bidx._cache_bytes = 0
            import gc

            gc.collect()

    sf1_mult = int(os.environ.get("BM25SPARK_BENCH_SF1_MULT", "10"))
    if sf1_mult > 1:
        serve_scaled("sf1", sf1_mult, build_repeats=2)

    sf34_mult = int(os.environ.get("BM25SPARK_BENCH_SF34_MULT", "34"))
    if sf34_mult > 1:
        serve_scaled("sf34", sf34_mult, build_repeats=1)

    # ---- full exact-scorer Catalyst plan ----
    steady(
        "exact_q_multi",
        lambda: exact_topk(
            spark, docs, "text", "doc_id", "merge spark window", 10
        ).collect(),
    )

    from bm25spark.distributed import search_distributed

    search_distributed(spark, idx_docs_dir, "warm up", 10).collect()
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        search_distributed(
            spark, idx_docs_dir, "merge spark window", 10
        ).collect()
        samples.append(time.perf_counter() - t0)
    record("dist_q_multi", samples, digits=3)

    # ---- batched distributed serving: all 4 wand queries in ONE job;
    # compare against 4x dist_q to see the amortization
    from bm25spark.distributed import search_distributed_batch

    qbatch = {f"q{i}": q for i, q in enumerate(wand_queries.values())}
    search_distributed_batch(spark, idx_docs_dir, qbatch, 10).collect()
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        search_distributed_batch(spark, idx_docs_dir, qbatch, 10).collect()
        samples.append(time.perf_counter() - t0)
    record("dist_batch4", samples, digits=3)

    # ---- growing∪sealed search (delta leg Catalyst + sealed leg
    # distributed, tombstones as a per-shard blocklist) ----
    from bm25spark.maintain import delete, insert, search_with_delta_df

    insert(
        spark,
        idx_docs_dir,
        docs.select((F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text")
        .limit(500),
        "text",
    )
    delete(
        spark,
        idx_docs_dir,
        docs.select("doc_id").filter(F.col("doc_id") % 17 == 0),
    )
    search_with_delta_df(spark, idx_docs_dir, "warm up", 10, "text").collect()
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        search_with_delta_df(
            spark, idx_docs_dir, "merge spark window", 10, "text"
        ).collect()
        samples.append(time.perf_counter() - t0)
    record("delta_q_multi", samples, digits=3)

    # ---- batched growing∪sealed: all 4 wand queries against the
    # mutated index in two jobs total (vs 4x delta_q single jobs)
    from bm25spark.maintain import search_with_delta_batch_df

    search_with_delta_batch_df(
        spark, idx_docs_dir, qbatch, 10, "text"
    ).collect()
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        search_with_delta_batch_df(
            spark, idx_docs_dir, qbatch, 10, "text"
        ).collect()
        samples.append(time.perf_counter() - t0)
    record("delta_batch4", samples, digits=3)

    # ---- training-data pipeline operators (steady-state, see above) ----
    steady(
        "dedup_minhash_pairs",
        lambda: dedup.minhash_candidate_pairs(docs).collect(),
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    steady("ann_cosine_topk", lambda: similarity.ann_cosine_topk(emb).collect())
    steady("ann_pq_topk", lambda: similarity.ann_pq_topk(emb).collect())
    steady("ann_ivfpq_topk", lambda: similarity.ann_ivfpq_topk(emb).collect())

    steady("text_stats", lambda: textstats.text_stats(docs).collect())

    from bm25spark.datapipe import bpe

    steady(
        "dedup_substring_spans",
        lambda: dedup.substring_dup_spans(docs).collect(),
    )
    steady("bpe_train16", lambda: bpe.bpe_train(docs, n_merges=16).collect())

    out = {
        "metric": "bm25 index build + top-k query + datapipe wall time",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "n_docs": n_docs,
        "synth_docs": synth_n,
        "repeats": repeats,
        "noise": noise,
        "noise_max": max(noise.values()) if noise else 1.0,
        **extras,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
