"""Mutation & maintenance: insert / delete / vacuum + delta-aware
search (SURVEY.md §2.9 M2-M4, §2.5 O6, §2.7 Q4).

Batch-native restatement of the reference's growing/sealed segment
model (insert appends to a growing tape, insert.rs:23-79; bulkdelete
flags docs, bulkdelete.rs:20-112; VACUUM merges and relabels,
maintain.rs:27-311):

- ``insert``   appends raw rows to a *delta* parquet table.
- ``delete``   appends tombstones: sealed docs by internal id (looked
               up via payload key), delta rows by payload key.
- ``search_with_delta`` unions WAND results over the sealed index
  (tombstones as a prefilter mask, P4) with exact scoring of the delta
  docs (Q4) — scored against the *sealed* statistics (N, avgdl, df),
  exactly like the reference, whose growing-segment scan uses the
  token dictionary and jump stats as of the last merge
  (search.rs:49-51,83-135). Terms absent from the sealed dictionary
  contribute nothing even if present in delta docs (search.rs:55-62).
- ``vacuum``   compacts: drops tombstoned docs, relabels survivors to
  dense ids (the reference's relabel array, maintain.rs:330-362 — here
  the J4 relabel *join*), tokenizes and appends delta docs, re-runs the
  build's sort+flush stages, and atomically swaps the artifact dirs
  (publish-last, like build.rs:60-70).
"""

from __future__ import annotations

import os
import shutil
from collections import Counter

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyze import analyze_query, get_analyzer, intern_str
from .build import _assign_doc_ids, _fieldnorm_expr, finalize_index
from .config import Bm25Config
from .fieldnorm import length_to_fieldnorm
from .index import Bm25Index
from .scoring import Cache
from .udfs import with_doc_terms


def _delta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "delta")


def _tomb_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def _delta_tomb_path(index_dir: str) -> str:
    return os.path.join(index_dir, "delta_tombstones")


def _cfg_from_meta(meta: dict) -> Bm25Config:
    return Bm25Config(
        k1=float(meta["k1"]),
        b=float(meta["b"]),
        seed=bytes.fromhex(meta["seed"]),
        analyzer=meta["analyzer"],
        shard_size=int(meta["shard_size"]),
        term_buckets=int(meta["term_buckets"]),
    )


def insert(spark: SparkSession, index_dir: str, rows: DataFrame, text_col: str) -> None:
    """Append documents to the growing (delta) segment — M2."""
    idx = Bm25Index(spark, index_dir)
    keep = list(dict.fromkeys([*idx.payload_cols, text_col]))
    rows.select(*keep).write.mode("append").parquet(_delta_path(index_dir))


def delete(spark: SparkSession, index_dir: str, keys: DataFrame) -> None:
    """Tombstone documents by payload key — M3. ``keys`` has the
    index's payload columns."""
    idx = Bm25Index(spark, index_dir)
    pc = idx.payload_cols
    sealed = idx.docs_df().join(
        keys.select(*[F.col(c).alias(f"p_{c}") for c in pc]),
        [f"p_{c}" for c in pc],
        "left_semi",
    )
    sealed.select("doc_id").write.mode("append").parquet(_tomb_path(index_dir))
    keys.select(*pc).write.mode("append").parquet(_delta_tomb_path(index_dir))


def _tombstone_mask(spark: SparkSession, idx: Bm25Index, index_dir: str):
    path = _tomb_path(index_dir)
    if not os.path.exists(path):
        return None
    ids = [r.doc_id for r in spark.read.parquet(path).distinct().collect()]
    if not ids:
        return None
    mask = np.ones(idx.n_docs, dtype=bool)
    mask[np.asarray(ids, dtype=np.int64)] = False
    return mask


def _live_delta(spark: SparkSession, idx: Bm25Index, index_dir: str) -> DataFrame | None:
    path = _delta_path(index_dir)
    if not os.path.exists(path):
        return None
    delta = spark.read.parquet(path)
    dt = _delta_tomb_path(index_dir)
    if os.path.exists(dt):
        delta = delta.join(
            spark.read.parquet(dt).distinct(), idx.payload_cols, "left_anti"
        )
    return delta


def search_with_delta(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int,
    text_col: str,
    mode: str = "taat",
) -> list[tuple[tuple, float]]:
    """O6: growing ∪ sealed top-k. Returns [(payload tuple, score)]."""
    idx = Bm25Index(spark, index_dir)
    mask = _tombstone_mask(spark, idx, index_dir)

    sealed_hits = idx.search(query_text, k, mode=mode, allowed_mask=mask)
    pay_rows = (
        idx.docs_df()
        .filter(F.col("doc_id").isin([d for d, _ in sealed_hits]) if sealed_hits else F.lit(False))
        .select("doc_id", *[f"p_{c}" for c in idx.payload_cols])
        .collect()
    )
    payload_by_id = {
        r.doc_id: tuple(r[f"p_{c}"] for c in idx.payload_cols) for r in pay_rows
    }
    merged: list[tuple[float, int, tuple]] = [
        (s, d, payload_by_id[d]) for d, s in sealed_hits
    ]

    # Q4: brute-force the growing segment with sealed stats
    delta = _live_delta(spark, idx, index_dir)
    if delta is not None:
        analyzer = get_analyzer(idx.meta["analyzer"])
        qkeys = analyze_query(query_text, analyzer, idx.seed)
        stats = idx.term_stats(qkeys)  # sealed dictionary only
        caches = {
            key: Cache(idx.n_docs, s["df"], idx.k1, idx.b, idx.avgdl)
            for key, s in stats.items()
        }
        rows = delta.select(*idx.payload_cols, text_col).orderBy(
            *idx.payload_cols
        ).collect()
        for j, r in enumerate(rows):
            text = r[text_col]
            if text is None:
                continue
            counts = Counter(
                intern_str(idx.seed, t) for t in analyzer(text)
            )
            dl = sum(counts.values())
            fn = int(length_to_fieldnorm(dl))
            score = 0.0
            for key in qkeys:
                if key in caches and counts[key]:
                    score += float(caches[key].evaluate(fn, counts[key]))
            if score > 0.0:
                merged.append(
                    (score, idx.n_docs + j, tuple(r[c] for c in idx.payload_cols))
                )

    merged.sort(key=lambda t: (-t[0], t[1]))
    return [(payload, score) for score, _, payload in merged[:k]]


def vacuum(spark: SparkSession, index_dir: str, text_col: str) -> str:
    """M4: merge delta + drop tombstones + relabel + rebuild, swap dirs."""
    idx = Bm25Index(spark, index_dir)
    cfg = _cfg_from_meta(idx.meta)
    pc = idx.payload_cols
    work = index_dir.rstrip("/") + ".vacuum"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    # --- survivors of the sealed segment, relabeled densely (J4) ---
    sealed = idx.docs_df()
    tp = _tomb_path(index_dir)
    if os.path.exists(tp):
        sealed = sealed.join(
            spark.read.parquet(tp).distinct(), "doc_id", "left_anti"
        )
    sealed = sealed.withColumnRenamed("doc_id", "old_id")
    parts = max(spark.sparkContext.defaultParallelism, 8)
    relabeled = _assign_doc_ids(spark, sealed, ["old_id"], parts, pin_output=True)
    relabeled.persist()
    n_sealed = relabeled.count()

    # --- delta docs: tokenize, ids after the sealed block ---
    delta = _live_delta(spark, idx, index_dir)
    if delta is not None and delta.count() > 0:
        prep = with_doc_terms(delta, text_col, cfg.analyzer, cfg.seed)
        dass = _assign_doc_ids(spark, prep, pc, parts, pin_output=True).withColumn(
            "_iid", F.col("_iid") + F.lit(n_sealed)
        )
        dass = dass.withColumn("content_sha256", F.sha2(F.col(text_col), 256))
        fn_expr = _fieldnorm_expr()
        delta_docs = dass.select(
            F.col("_iid").alias("doc_id"),
            F.col("doc_len").cast("long").alias("doc_len"),
            fn_expr.alias("fieldnorm"),
            "content_sha256",
            *[F.col(c).alias(f"p_{c}") for c in pc],
        )
        delta_maps = dass.select(
            F.col("_iid").alias("gid"), F.explode("terms").alias("t")
        ).select(
            F.col("t.key").alias("term_key"),
            "gid",
            F.col("t.tf").alias("tf"),
        )
    else:
        delta_docs = delta_maps = None

    # --- new docs artifact ---
    new_docs = relabeled.select(
        F.col("_iid").alias("doc_id"),
        "doc_len",
        "fieldnorm",
        "content_sha256",
        *[f"p_{c}" for c in pc],
    )
    if delta_docs is not None:
        new_docs = new_docs.unionByName(delta_docs)
    new_docs = new_docs.withColumn(
        "shard", (F.col("doc_id") / cfg.shard_size).cast("int")
    ).withColumn("local_id", (F.col("doc_id") % cfg.shard_size).cast("long"))
    new_docs.repartitionByRange(max(1, parts // 4), "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.parquet(os.path.join(work, "docs"))

    # --- new mappings: sealed relabel join ∪ delta ---
    old_maps = spark.read.parquet(os.path.join(index_dir, "mappings")).withColumn(
        "gid",
        F.col("shard").cast("long") * cfg.shard_size + F.col("local_id"),
    )
    relabel_map = relabeled.select(
        F.col("old_id").alias("gid"), F.col("_iid").alias("new_gid")
    )
    new_maps = (
        old_maps.join(relabel_map, "gid")  # inner join drops tombstoned
        .select("term_key", F.col("new_gid").alias("gid"), "tf")
    )
    if delta_maps is not None:
        new_maps = new_maps.unionByName(delta_maps)
    fns = spark.read.parquet(os.path.join(work, "docs")).select(
        F.col("doc_id").alias("gid"), "fieldnorm"
    )
    (
        new_maps.join(fns, "gid")
        .select(
            "term_key",
            (F.col("gid") / cfg.shard_size).cast("int").alias("shard"),
            (F.col("gid") % cfg.shard_size).cast("long").alias("local_id"),
            "tf",
            "fieldnorm",
        )
        .write.parquet(os.path.join(work, "mappings"))
    )
    relabeled.unpersist()

    finalize_index(spark, work, cfg, pc)

    # --- atomic swap (publish-last) ---
    old = index_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir, old)
    os.rename(work, index_dir)
    shutil.rmtree(old)
    return index_dir
