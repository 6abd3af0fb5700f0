"""Mutation & maintenance: insert / delete / vacuum + delta-aware
search (SURVEY.md §2.9 M2-M4, §2.5 O6, §2.7 Q4).

Batch-native restatement of the reference's growing/sealed segment
model (insert appends to a growing tape, insert.rs:23-79; bulkdelete
flags docs, bulkdelete.rs:20-112; VACUUM merges and relabels,
maintain.rs:27-311):

- ``insert``   appends raw rows to a *delta* parquet table, stamped
  with a monotonically increasing mutation sequence number.
- ``delete``   appends tombstones: sealed docs by internal id (looked
  up via payload key), delta rows by payload key + the same sequence
  counter. A delta row is hidden only by a tombstone whose sequence is
  *later* than the row's, so insert(key) after delete(key) is live
  again — matching the reference's heap semantics, where a row
  inserted after a DELETE is a new, visible tuple.
- ``search_with_delta`` unions the distributed sealed search
  (tombstones shipped per shard as a blocklist mask, P4 — never an
  O(n_docs) driver allocation) with Catalyst exact scoring of the
  delta docs (Q4) — scored against the *sealed* statistics (N, avgdl,
  df), exactly like the reference, whose growing-segment scan uses the
  token dictionary and jump stats as of the last merge
  (search.rs:49-51,83-135). Terms absent from the sealed dictionary
  contribute nothing even if present in delta docs (search.rs:55-62).
  Both legs are Spark jobs; nothing is collected except the final k
  rows, so an un-compacted delta of 10M rows is scanned where it
  lives, not on the driver.
- ``vacuum``   compacts: drops tombstoned docs, relabels survivors to
  dense ids (the reference's relabel array, maintain.rs:330-362 — here
  the J4 relabel *join*), tokenizes and appends delta docs, re-runs the
  build's sort+flush stages, and atomically swaps the artifact dirs
  (publish-last, like build.rs:60-70).
- ``maybe_vacuum`` is the auto-seal policy: vacuum once the live delta
  exceeds a row threshold — the analogue of the reference's
  ``bm25.segment_growing_max_page_size`` GUC (README.md:466: growing
  segments auto-seal at 4,096 pages).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyze import analyze_query, get_analyzer
from .build import (
    _assign_doc_ids,
    _ensure_readable_parquet,
    _fieldnorm_expr,
    finalize_index,
)
from .config import Bm25Config
from .index import Bm25Index
from .query import quantized_dl
from .udfs import with_doc_terms

#: auto-seal threshold (live delta rows) used when none is given —
#: the reference seals growing segments at 4,096 pages (README.md:466);
#: rows are our page analogue.
DEFAULT_MAX_DELTA_ROWS = 4096


def _delta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "delta")


def _tomb_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def _delta_tomb_path(index_dir: str) -> str:
    return os.path.join(index_dir, "delta_tombstones")


def _seq_path(index_dir: str) -> str:
    return os.path.join(index_dir, "delta_seq")


def _next_seq(index_dir: str) -> int:
    """Monotonic mutation sequence, one per insert/delete call. A tiny
    driver-side counter file — mutations are driver-issued commands, so
    this is not a distributed bottleneck; vacuum resets it along with
    the delta (the swapped-in artifact dir has no counter file)."""
    path = _seq_path(index_dir)
    n = 0
    if os.path.exists(path):
        with open(path) as f:
            n = int(f.read().strip() or 0)
    with open(path, "w") as f:
        f.write(str(n + 1))
    return n


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
    """Append documents to the growing (delta) segment — M2.

    Every row is stamped with ``(_seq, _rid)`` — the batch's mutation
    sequence plus a within-batch row id — a unique per-row key. Delta
    scoring groups on it, so two live inserts that happen to share a
    payload key score as two independent pseudo-docs (the reference's
    heap semantics: each inserted tuple is its own document), matching
    what vacuum produces when it gives each row its own doc_id."""
    idx = Bm25Index(spark, index_dir)
    keep = list(dict.fromkeys([*idx.payload_cols, text_col]))
    seq = _next_seq(index_dir)
    (
        rows.select(*keep)
        .withColumn("_seq", F.lit(seq).cast("long"))
        .withColumn("_rid", F.monotonically_increasing_id())
        .write.mode("append")
        .parquet(_delta_path(index_dir))
    )


def delete(spark: SparkSession, index_dir: str, keys: DataFrame) -> None:
    """Tombstone documents by payload key — M3. ``keys`` has the
    index's payload columns. Only delta rows inserted *before* this
    call are masked (sequence-stamped tombstones)."""
    idx = Bm25Index(spark, index_dir)
    pc = idx.payload_cols
    sealed = idx.docs_df().join(
        keys.select(*[F.col(c).alias(f"p_{c}") for c in pc]),
        [f"p_{c}" for c in pc],
        "left_semi",
    )
    seq = _next_seq(index_dir)
    sealed.select("doc_id").write.mode("append").parquet(_tomb_path(index_dir))
    keys.select(*pc).withColumn("_seq", F.lit(seq).cast("long")).write.mode(
        "append"
    ).parquet(_delta_tomb_path(index_dir))


def _tombstones_df(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Sealed-segment tombstones as a (small) distributed DataFrame of
    internal ``doc_id`` rows — routed per shard by the distributed
    search, never collected into a dense driver array (P4 at scale)."""
    path = _tomb_path(index_dir)
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path).select("doc_id").distinct()


def _live_delta(spark: SparkSession, idx: Bm25Index, index_dir: str) -> DataFrame | None:
    """Delta rows still visible: a row is hidden only by a tombstone on
    its key with a *later* mutation sequence (delete-then-reinsert
    keeps the reinserted row live)."""
    path = _delta_path(index_dir)
    if not os.path.exists(path):
        return None
    delta = spark.read.parquet(path)
    dt = _delta_tomb_path(index_dir)
    if os.path.exists(dt):
        tombs = (
            spark.read.parquet(dt)
            .groupBy(idx.payload_cols)
            .agg(F.max("_seq").alias("_tomb_seq"))
        )
        delta = (
            delta.join(F.broadcast(tombs), idx.payload_cols, "left")
            .filter(
                F.col("_tomb_seq").isNull() | (F.col("_seq") > F.col("_tomb_seq"))
            )
            .drop("_tomb_seq")
        )
    # unique per-row key for downstream grouping / deterministic id
    # assignment. Fail loudly if _rid is missing rather than collapse
    # a whole insert batch into one pseudo-doc: a _rid-less delta can
    # only come from hand-edited files (v1 indexes are rejected at
    # open, and every v2 insert stamps _rid).
    if "_rid" not in delta.columns:
        raise ValueError(
            f"delta table at {path} lacks the per-row _rid column; "
            "it was not written by bm25spark.maintain.insert — "
            "re-insert the rows (or vacuum from source) before searching"
        )
    return delta.withColumn(
        "_rowid",
        F.concat_ws(
            "#", F.col("_seq").cast("string"), F.col("_rid").cast("string")
        ),
    ).drop("_seq", "_rid")


def _delta_topk_df(
    spark: SparkSession,
    idx: Bm25Index,
    delta: DataFrame,
    query_text: str,
    k: int,
    text_col: str,
) -> DataFrame | None:
    """Q4 distributed: exact-score the growing segment with the *sealed*
    statistics (N, avgdl, per-term df from the sealed dictionary;
    terms absent from it contribute nothing — search.rs:49-62,83-135).
    Pure Catalyst: the fused tokenizer UDF is the only Python crossing;
    tf extraction, quantized-length lookup, and scoring are codegen
    expressions, and only the top-k rows leave the executors.

    Returns (payload cols..., score) with *raw* float64 scores,
    bit-compatible with the sealed kernel's Cache math (same operation
    order), or ``None`` when no query term exists in the sealed
    dictionary."""
    import math

    qkeys = analyze_query(query_text, get_analyzer(idx.meta["analyzer"]), idx.seed)
    stats = idx.term_stats(qkeys)
    present = [key for key in qkeys if key in stats]  # sorted (qkeys sorted)
    if not present:
        return None
    pc = idx.payload_cols
    k1, b, avgdl, n = idx.k1, idx.b, idx.avgdl, idx.n_docs
    s0s = {
        key: math.log((float(n) + 1.0) / (float(stats[key]["df"]) + 0.5))
        * (k1 + 1.0)
        for key in present
    }

    prep = with_doc_terms(delta, text_col, idx.meta["analyzer"], idx.seed)
    # group on the unique per-row key (_rowid), NOT the payload
    # columns: two live inserts sharing a payload key are two
    # independent pseudo-docs (each with its own doc_len/tf), exactly
    # as vacuum will score them once each has its own doc_id
    m = prep.select(
        "_rowid", *pc, "doc_len", F.explode("terms").alias("t")
    ).select(
        "_rowid",
        *pc,
        "doc_len",
        F.col("t.key").alias("term_key"),
        F.col("t.tf").alias("tf"),
    )
    # Cache math (scoring.py): s0 = idf*(k1+1); s1 = k1*(1-b+b*qdl/avgdl);
    # contribution = tf*s0/(tf+s1) — identical operation order to the
    # sealed kernel so merged rankings are float-consistent.
    from .query import WIDE_QUERY_TERMS

    s1_of = lambda qdl_col: F.lit(k1) * (  # noqa: E731
        F.lit(1.0 - b) + F.lit(b) * qdl_col / F.lit(avgdl)
    )
    if len(present) <= WIDE_QUERY_TERMS:
        per_doc = m.groupBy("_rowid").agg(
            *[F.first(c).alias(c) for c in pc],
            F.first("doc_len").cast("bigint").alias("doc_len"),
            *[
                F.coalesce(
                    F.max(F.when(F.col("term_key") == F.lit(key), F.col("tf"))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias(f"_tf{i}")
                for i, key in enumerate(present)
            ],
        )
        matched = per_doc.filter(
            F.greatest(*[F.col(f"_tf{i}") for i in range(len(present))]) > 0
            if len(present) > 1
            else F.col("_tf0") > 0
        )
        matched = quantized_dl(spark, matched, "doc_len")
        s1 = s1_of(F.col("qdl"))
        score_terms = []
        for i, key in enumerate(present):
            score_terms.append(
                F.when(
                    F.col(f"_tf{i}") > 0,
                    F.col(f"_tf{i}") * F.lit(s0s[key]) / (F.col(f"_tf{i}") + s1),
                ).otherwise(F.lit(0.0))
            )
        total = score_terms[0]
        for t in score_terms[1:]:
            total = total + t
        scored = matched.withColumn("score", total).filter(F.col("score") > 0.0)
    else:
        # wide-query form (same threshold as exact_topk): pinned s0 per
        # key joins the exploded terms via a broadcast map; one
        # hash-aggregate per doc sums the key-sorted contributions —
        # same accumulation order as the pivot form and the sealed
        # kernel, no per-term aggregate columns
        s0_df = spark.createDataFrame(
            [(key, s0) for key, s0 in sorted(s0s.items())], ["term_key", "s0"]
        )
        per_doc = m.groupBy("_rowid").agg(
            *[F.first(c).alias(c) for c in pc],
            F.first("doc_len").cast("bigint").alias("doc_len"),
            F.collect_list(F.struct("term_key", "tf")).alias("pairs"),
        )
        matched = quantized_dl(spark, per_doc, "doc_len")
        exploded = matched.select(
            "_rowid", *pc, "qdl", F.explode("pairs").alias("p")
        ).select(
            "_rowid",
            *pc,
            "qdl",
            F.col("p.term_key").alias("term_key"),
            F.col("p.tf").cast("bigint").alias("tf"),
        )
        contrib = F.col("tf") * F.col("s0") / (F.col("tf") + s1_of(F.col("qdl")))
        scored = (
            exploded.join(F.broadcast(s0_df), "term_key")
            .select("_rowid", *pc, "term_key", contrib.alias("c"))
            .groupBy("_rowid")
            .agg(
                *[F.first(c).alias(c) for c in pc],
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term_key", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("score"),
            )
            .filter(F.col("score") > 0.0)
        )
    return (
        scored.select(*pc, "score")
        .orderBy(F.desc("score"), *pc)
        .limit(k)
    )


def search_with_delta_df(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int,
    text_col: str,
    round_score: int | None = 4,
    slack: int = 128,
) -> DataFrame:
    """O6 growing∪sealed top-k as one distributed plan: sealed segment
    via :func:`bm25spark.distributed.search_distributed` (tombstones as
    a per-shard blocklist), growing segment via :func:`_delta_topk_df`,
    union → (rounded) re-rank → limit k. With ``round_score`` set, both
    legs over-fetch by ``slack`` so the rounded boundary cannot drop a
    tied survivor (same convention as ``Bm25Index.search_df``).

    Returns (payload cols..., score) best-first, ties by payload cols
    ascending."""
    from .distributed import search_distributed

    idx = Bm25Index(spark, index_dir)
    pc = idx.payload_cols

    def _empty() -> DataFrame:
        from pyspark.sql.types import DoubleType, StructField, StructType

        src = idx.docs_df().select(
            *[F.col(f"p_{c}").alias(c) for c in pc]
        ).schema
        return spark.createDataFrame(
            [], StructType(list(src.fields) + [StructField("score", DoubleType())])
        )

    qkeys = analyze_query(query_text, get_analyzer(idx.meta["analyzer"]), idx.seed)
    if not qkeys or not idx.term_stats(qkeys):
        return _empty()

    k_fetch = k + (slack if round_score is not None else 0)
    sealed = search_distributed(
        spark,
        index_dir,
        query_text,
        k_fetch,
        round_score=None,
        blocked=_tombstones_df(spark, index_dir),
    ).select(*pc, "score")

    merged = sealed
    delta = _live_delta(spark, idx, index_dir)
    if delta is not None:
        dtop = _delta_topk_df(spark, idx, delta, query_text, k_fetch, text_col)
        if dtop is not None:
            merged = merged.unionByName(dtop.select(*pc, "score"))

    score_col = (
        F.round(F.col("score"), round_score)
        if round_score is not None
        else F.col("score")
    )
    return (
        merged.select(*pc, score_col.alias("score"))
        .orderBy(F.desc("score"), *pc)
        .limit(k)
    )


def search_with_delta(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int,
    text_col: str,
    mode: str = "taat",  # kept for API compat; the sealed leg is taat
) -> list[tuple[tuple, float]]:
    """O6: growing ∪ sealed top-k. Returns [(payload tuple, score)] with
    raw float64 scores — a thin collect over :func:`search_with_delta_df`."""
    idx = Bm25Index(spark, index_dir)
    pc = idx.payload_cols
    rows = search_with_delta_df(
        spark, index_dir, query_text, k, text_col, round_score=None
    ).collect()
    return [(tuple(r[c] for c in pc), float(r["score"])) for r in rows]


def delta_size(spark: SparkSession, index_dir: str) -> int:
    """Live (visible) rows in the growing segment."""
    idx = Bm25Index(spark, index_dir)
    delta = _live_delta(spark, idx, index_dir)
    return 0 if delta is None else delta.count()


def maybe_vacuum(
    spark: SparkSession,
    index_dir: str,
    text_col: str,
    max_delta_rows: int = DEFAULT_MAX_DELTA_ROWS,
) -> bool:
    """Auto-seal policy (reference README.md:466's
    ``segment_growing_max_page_size`` analogue): vacuum iff the live
    delta exceeds ``max_delta_rows``. Returns True when a vacuum ran."""
    if delta_size(spark, index_dir) <= max_delta_rows:
        return False
    vacuum(spark, index_dir, text_col)
    return True


def gc_index(index_dir: str, grace_sec: float | None = None) -> bool:
    """Delete the retired previous generation's artifact dirs once the
    grace period has elapsed (``BM25SPARK_VACUUM_GRACE_SEC``, default
    0). Called automatically at the start of every vacuum, so disk
    holds at most two generations; call explicitly to reclaim sooner.
    Returns True when something was reclaimed."""
    import json as _json
    import time as _time

    grace = (
        float(os.environ.get("BM25SPARK_VACUUM_GRACE_SEC", "0"))
        if grace_sec is None
        else grace_sec
    )
    mp = os.path.join(index_dir, "meta.json")
    with open(mp) as f:
        meta = _json.load(f)
    retired = meta.get("retired")
    if not retired or _time.time() - float(retired["at"]) < grace:
        return False
    root = os.path.realpath(index_dir)
    for rel in retired["paths"]:
        tgt = os.path.realpath(os.path.join(index_dir, rel))
        if tgt.startswith(root + os.sep):  # never step outside the index
            shutil.rmtree(tgt, ignore_errors=True)
    meta.pop("retired", None)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f, indent=2)
    os.replace(tmp, mp)
    return True


def vacuum(spark: SparkSession, index_dir: str, text_col: str) -> str:
    """M4: merge delta + drop tombstones + relabel + rebuild, then
    publish the new artifacts as a *versioned generation*.

    Concurrent-reader-safe publish (the reference gets this from
    PostgreSQL MVCC; a filesystem/object-store index needs it built
    in): the new artifacts land in ``index_dir/gen{N}/`` and the only
    mutation to the live tree is an atomic ``meta.json`` replace that
    repoints the artifact paths (publish-last, like build.rs:60-70).
    A ``Bm25Index`` opened before the vacuum holds the old meta and
    keeps reading the old generation's files, which stay on disk until
    :func:`gc_index` reclaims them after a grace period (the next
    vacuum GCs its grandparent automatically)."""
    idx = Bm25Index(spark, index_dir)
    cfg = _cfg_from_meta(idx.meta)
    pc = idx.payload_cols
    gen = int(idx.meta.get("generation", 0)) + 1
    # reclaim the grandparent generation (if its grace elapsed)
    gc_index(index_dir)
    work = os.path.join(index_dir, f"gen{gen}.build")
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
        # _rowid makes the order key unique even when payload keys
        # repeat, so every delta row gets its own deterministic doc_id
        dass = _assign_doc_ids(
            spark, prep, [*pc, "_rowid"], parts, pin_output=True
        ).withColumn(
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
    _ensure_readable_parquet(os.path.join(work, "docs"), new_docs.schema)

    # --- new mappings: sealed relabel join ∪ delta ---
    old_maps = spark.read.parquet(idx._path("mappings")).withColumn(
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
    vm = new_maps.join(fns, "gid").select(
        "term_key",
        (F.col("gid") / cfg.shard_size).cast("int").alias("shard"),
        (F.col("gid") % cfg.shard_size).cast("long").alias("local_id"),
        "tf",
        "fieldnorm",
    )
    vm.write.parquet(os.path.join(work, "mappings"))
    _ensure_readable_parquet(os.path.join(work, "mappings"), vm.schema)
    relabeled.unpersist()

    finalize_index(spark, work, cfg, pc)

    # --- versioned publish (publish-last) ---
    import json as _json
    import time as _time

    gen_dir = os.path.join(index_dir, f"gen{gen}")
    shutil.rmtree(gen_dir, ignore_errors=True)
    os.rename(work, gen_dir)  # same parent: atomic
    with open(os.path.join(gen_dir, "meta.json")) as f:
        new_meta = _json.load(f)
    new_meta["generation"] = gen
    new_meta["paths"] = {
        k: f"gen{gen}/{v}" for k, v in new_meta["paths"].items()
    }
    # the outgoing generation's top-level dirs, kept on disk for
    # concurrent readers until gc_index's grace elapses. If a previous
    # retired set is still unreclaimed (vacuum ran again inside the
    # grace window), carry its paths forward — overwriting it would
    # orphan the grandparent's dirs on disk forever.
    prev_retired = idx.meta.get("retired") or {}
    carried = prev_retired.get("paths", [])
    # keep the EARLIEST retired timestamp when carrying unreclaimed
    # paths forward — resetting it would restart the carried paths'
    # grace window on every back-to-back vacuum and delay reclamation
    # indefinitely (never deletes early either way, but late is waste)
    retired_at = _time.time()
    if carried:
        retired_at = min(retired_at, float(prev_retired.get("at", retired_at)))
    new_meta["retired"] = {
        "paths": sorted(
            set(carried)
            | {p.split("/")[0] for p in idx.meta["paths"].values()}
        ),
        "at": retired_at,
    }
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(new_meta, f, indent=2)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))

    # the growing segment is absorbed into gen{N}: reset it. (A reader
    # that opened the index before this point keeps its sealed-artifact
    # view; only the tiny window between the meta replace and this
    # reset can show a delta row twice to a *newly opened* delta-aware
    # search — the single-driver mutation model never hits it.)
    for p in (_delta_path, _tomb_path, _delta_tomb_path):
        shutil.rmtree(p(index_dir), ignore_errors=True)
    seqp = _seq_path(index_dir)
    if os.path.exists(seqp):
        os.remove(seqp)
    return index_dir
