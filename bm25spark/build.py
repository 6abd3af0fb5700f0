"""Distributed index build — the reference's `CREATE INDEX … USING
bm25` lifecycle (SURVEY.md §3.1; /root/reference/crates/bm25/src/
build.rs:22-71, src/index/bm25/am/am_build.rs:128-315) restated as a
sequence of Spark jobs with checkpoint/resume at stage granularity and
per-shard lineage rows.

Pipeline (thread/node boundaries in the reference = shuffles here):

1. ``docs``     scan source -> tokenize+intern (one fused Arrow UDF,
                narrow) -> deterministic dense doc-id assignment
                (global sort order by a caller-chosen unique key; ids
                are identical at any parallelism — *stronger* than the
                reference, which is single-machine-deterministic only)
                -> docs artifact (id, fieldnorm, doc_len, payload,
                content sha256) + mappings staging table.
2. ``stats``    N, Σdl  (flush.rs:49-66) -> part of meta.
3. ``postings`` mappings -> shard = id // shard_size -> shuffle on
                (term_key, shard) -> per-group block construction
                (128-posting chunks, delta bitpack, block-max WAND
                metadata; flush.rs:78-125) -> postings artifact,
                directory-partitioned by crc32(term_key) bucket.
4. ``terms``    per-term df + WAND argmax merged across shards with
                the Wand::extend monoid (bm25.rs:319-325) -> terms
                artifact (the broadcast dictionary).
5. ``meta``     meta.json written last = atomic publish
                (build.rs:60-70 writes jump+meta last for the same
                crash-atomicity).

Scale notes (designed for ~10^12 docs / 1000 executors, tested on
local[N]):
- The only global-sequential step, doc-id assignment, is two passes:
  per-partition counts (collect of P longs) + prefix-sum offsets
  (mirrors the reference's per-segment offset re-basing, io.rs:244-282).
- Skew: stop-word-like terms have postings far larger than one task.
  Sharding on id ranges splits *every* term's postings at shard
  boundaries (shard = doc-partitioned index, the standard distributed
  IR layout), so the build group and the query task for a hot term are
  both bounded by shard_size; block streams stay doc-id-ordered
  because shards are contiguous id ranges, and per-term stats merge
  monoidally (the north rule's "salted shuffle on skewed terms").
- Posting doc-ids are stored shard-relative (u32), so a corpus may
  exceed 2^32 docs even though each block stays in the reference's
  u32 domain (the reference has the same cap per segment, io.rs:52-57).
"""

from __future__ import annotations

import json
import os

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from . import fs as fsio
from . import packing
from .analyze import analyzer_fingerprint as _analyzer_fingerprint
from .config import BLOCK_SIZE, FORMAT_MAGIC, FORMAT_VERSION, Bm25Config
from .scoring import tf_score
from .udfs import with_doc_terms

POSTINGS_SCHEMA = StructType(
    [
        StructField("term_key", BinaryType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("shard", IntegerType(), False),
        StructField("block_ord", IntegerType(), False),
        StructField("min_doc", LongType(), False),
        StructField("max_doc", LongType(), False),
        StructField("count", IntegerType(), False),
        StructField("wand_fn", IntegerType(), False),
        StructField("wand_tf", IntegerType(), False),
        StructField("block_ub", DoubleType(), False),
        StructField("ids_meta", IntegerType(), False),
        StructField("ids_bytes", BinaryType(), False),
        StructField("tfs_meta", IntegerType(), False),
        StructField("tfs_bytes", BinaryType(), False),
    ]
)


def term_bucket(term_key: bytes, n_buckets: int) -> int:
    """crc32-based bucket; zlib.crc32 == Spark's crc32 (both CRC-32/ISO),
    so driver-side query routing and executor-side writes agree."""
    return zlib.crc32(term_key) % n_buckets


def _stage_done(path: str) -> bool:
    return fsio.exists(fsio.join(path, "_SUCCESS"))


def _ensure_readable_parquet(path: str, schema, subdir: str | None = None) -> None:
    """AQE coalesces an empty frame to zero partitions, so its parquet
    write can produce a directory with no data files — unreadable
    (UNABLE_TO_INFER_SCHEMA) for every later reader. Drop one empty,
    schema-carrying file in (for hive-partitioned artifacts, under a
    synthetic partition dir) so an *empty index* builds, loads and
    searches cleanly — CREATE INDEX on an empty table works in the
    reference and must work here."""
    if fsio.has_parquet_files(path):
        return
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = fsio.join(path, subdir) if subdir else path
    fsio.mkdirs(target)
    fs, fpath = fsio.resolve(fsio.join(target, "part-empty.parquet"))
    pq.write_table(
        to_arrow_schema(schema).empty_table(), fpath, filesystem=fs
    )


def _assign_doc_ids(
    spark: SparkSession,
    df: DataFrame,
    order_cols: list[str],
    partitions: int,
    pin_output: bool = False,
) -> DataFrame:
    """Dense deterministic ids 0..N-1 in the global sort order of
    ``order_cols`` (which must be a unique key). Two passes: range
    shuffle + per-partition counts, then offset + local rank — the
    Spark form of the reference's sequential RecordsWriter doc-id
    counter (io.rs:39-67) without the sequential bottleneck.

    The range-shuffled frame is eagerly local-checkpointed *before*
    the counts pass: Spark's RangePartitioner re-samples boundaries on
    every action (seed depends on the RDD id), so without pinning, the
    counts job and the assign job can see different partitionings and
    mint duplicate ids. Pinning also keeps the per-partition rank
    meaningful if a later plan (e.g. vacuum's union) would otherwise
    merge the mapInPandas into a wider stage. The *id values* are
    independent of where the sampled boundaries fall — they equal the
    global rank under order_cols — so artifacts stay identical across
    cluster sizes."""
    parts = (
        df.repartitionByRange(partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
    )
    counts = (
        parts.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    by_pid = {r._pid: r["count"] for r in counts}
    offsets, acc = {}, 0
    for pid in range(partitions):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    boffsets = spark.sparkContext.broadcast(offsets)

    schema = StructType(
        parts.schema.fields + [StructField("_iid", LongType(), False)]
    )

    def assign(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = boffsets.value[pid]
        seen = 0
        for pdf in iterator:
            pdf = pdf.copy()
            pdf["_iid"] = np.arange(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    out = parts.mapInPandas(assign, schema)
    if pin_output:
        # second pin: keeps partition ids valid when a later plan (the
        # vacuum union) would merge this mapInPandas into a wider
        # stage. The plain build skips it — its next step writes the
        # frame to parquet directly, so no such merge can happen.
        out = out.localCheckpoint(eager=True)
    return out


def _blocks_from_arrays(
    keys: np.ndarray,
    shards: np.ndarray,
    lids: np.ndarray,
    tfs_all: np.ndarray,
    fns_all: np.ndarray,
    k1: float,
    b: float,
    avgdl: float,
    shard_size: int,
    n_buckets: int,
) -> list:
    """Shared block-construction kernel over parallel posting arrays
    (any order): lexsort by (term_key, shard, local_id), find group
    boundaries vectorized, emit 128-posting blocks per (term, shard)
    group — compression + block-max WAND exactly as the reference's
    flush loop (flush.rs:78-125), with group dispatch costing an
    argwhere over the sorted keys instead of one pandas DataFrame per
    group (~50k tiny groups otherwise)."""
    order = np.lexsort((lids, shards, keys))
    keys, shards, lids = keys[order], shards[order], lids[order]
    tfs_all, fns_all = tfs_all[order], fns_all[order]

    change = (keys[1:] != keys[:-1]) | (shards[1:] != shards[:-1])
    bounds = np.concatenate(([0], np.flatnonzero(change) + 1, [len(keys)]))

    rows = []
    if len(keys):
        for gi in range(len(bounds) - 1):
            lo, hi = int(bounds[gi]), int(bounds[gi + 1])
            # numpy S16 strips trailing NULs; re-pad — unambiguous
            # because raw interned keys contain no interior NULs and
            # hashed keys end in a forced-nonzero byte (vector.rs:30-32)
            term_key = bytes(keys[lo]).ljust(16, b"\x00")
            shard = int(shards[lo])
            base = shard * shard_size
            bucket = term_bucket(term_key, n_buckets)
            ids = lids[lo:hi].astype(np.uint32)
            tfs = tfs_all[lo:hi].astype(np.uint32)
            fns = fns_all[lo:hi]
            scores = tf_score(fns, tfs, k1, b, avgdl)

            n = len(ids)
            n_full = n // BLOCK_SIZE
            # full blocks: batch-packed (one vector op per distinct
            # bitwidth instead of one call per block)
            if n_full:
                full = n_full * BLOCK_SIZE
                ids2d = ids[:full].reshape(-1, BLOCK_SIZE)
                tfs2d = tfs[:full].reshape(-1, BLOCK_SIZE)
                sc2d = scores[:full].reshape(-1, BLOCK_SIZE)
                fn2d = fns[:full].reshape(-1, BLOCK_SIZE)
                am2d = np.argmax(sc2d, axis=1)
                id_packs = packing.compress_id_blocks(ids2d)
                tf_packs = packing.compress_tf_blocks(tfs2d)
                for j in range(n_full):
                    rows.append(
                        (
                            term_key,
                            bucket,
                            shard,
                            j,
                            base + int(ids2d[j, 0]),
                            base + int(ids2d[j, -1]),
                            BLOCK_SIZE,
                            int(fn2d[j, am2d[j]]),
                            int(tfs2d[j, am2d[j]]),
                            float(sc2d[j, am2d[j]]),
                            id_packs[j][0],
                            id_packs[j][1],
                            tf_packs[j][0],
                            tf_packs[j][1],
                        )
                    )
            # tail block (< 128 postings): bytepacked, per-block path
            if n_full * BLOCK_SIZE < n:
                start = n_full * BLOCK_SIZE
                bi, bt, sc = ids[start:], tfs[start:], scores[start:]
                am = int(np.argmax(sc))
                ids_meta, ids_bytes = packing.compress_document_ids(int(bi[0]), bi)
                tfs_meta, tfs_bytes = packing.compress_term_frequencies(bt)
                rows.append(
                    (
                        term_key,
                        bucket,
                        shard,
                        n_full,
                        base + int(bi[0]),
                        base + int(bi[-1]),
                        len(bi),
                        int(fns[start + am]),
                        int(bt[am]),
                        float(sc[am]),
                        ids_meta,
                        ids_bytes,
                        tfs_meta,
                        tfs_bytes,
                    )
                )
    return rows


def _build_blocks_fn(cfg: Bm25Config, avgdl: float, n_buckets: int):
    """mapInPandas over exploded mapping rows hash-clustered by
    (term_key, shard) — the staging-parquet path used by vacuum and
    stage-granular resume."""
    k1, b = cfg.k1, cfg.b
    shard_size = cfg.shard_size

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        rows = _blocks_from_arrays(
            np.array(pdf["term_key"].to_list(), dtype="S16"),
            pdf["shard"].to_numpy(np.int64),
            pdf["local_id"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["fieldnorm"].to_numpy(np.int64),
            k1, b, avgdl, shard_size, n_buckets,
        )
        yield pd.DataFrame(rows, columns=POSTINGS_SCHEMA.fieldNames())

    return build


def _arrow_postings_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("term_key", pa.binary()),
            ("bucket", pa.int32()),
            ("shard", pa.int32()),
            ("block_ord", pa.int32()),
            ("min_doc", pa.int64()),
            ("max_doc", pa.int64()),
            ("count", pa.int32()),
            ("wand_fn", pa.int32()),
            ("wand_tf", pa.int32()),
            ("block_ub", pa.float64()),
            ("ids_meta", pa.int32()),
            ("ids_bytes", pa.binary()),
            ("tfs_meta", pa.int32()),
            ("tfs_bytes", pa.binary()),
        ]
    )


def _build_blocks_docs_fn(cfg: Bm25Config, avgdl: float, n_buckets: int):
    """mapInArrow over *doc-grouped* rows hash-clustered by shard —
    the build's hot path. Shuffling one compact row per document
    (term-key/tf arrays + per-doc shard/local_id/fieldnorm) instead of
    one row per posting cuts the shuffle volume of the build's only
    wide stage by ~40% (no per-posting repetition of local_id,
    fieldnorm, shard) and skips the staging-parquet read-back. The
    flatten back to posting arrays is zero-copy Arrow: list offsets →
    np.repeat for the per-doc columns, fixed-size-binary cast for the
    16-byte keys."""
    k1, b = cfg.k1, cfg.b
    shard_size = cfg.shard_size

    def build(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        tabs = list(batches)
        if not tabs:
            return
        t = pa.Table.from_batches(tabs)
        if t.num_rows == 0:
            return
        tk = t.column("tkeys").combine_chunks()
        lens = pc.list_value_length(tk).to_numpy().astype(np.int64)
        flat = tk.flatten()
        # every interned key is exactly 16 bytes; the cast both
        # validates that and yields a contiguous packed buffer
        fk = flat.cast(pa.binary(16))
        data = np.frombuffer(fk.buffers()[1], dtype="S16",
                             count=fk.offset + len(fk))
        keys = data[fk.offset:]
        tfs_all = (
            t.column("ttfs").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        shard_d = t.column("shard").to_numpy().astype(np.int64)
        lid_d = t.column("local_id").to_numpy().astype(np.int64)
        fn_d = t.column("fieldnorm").to_numpy().astype(np.int64)
        rows = _blocks_from_arrays(
            keys,
            np.repeat(shard_d, lens),
            np.repeat(lid_d, lens),
            tfs_all,
            np.repeat(fn_d, lens),
            k1, b, avgdl, shard_size, n_buckets,
        )
        out = pd.DataFrame(rows, columns=POSTINGS_SCHEMA.fieldNames())
        yield pa.RecordBatch.from_pandas(
            out, schema=_arrow_postings_schema(), preserve_index=False
        )

    return build


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    text_col: str,
    order_cols: list[str],
    payload_cols: list[str] | None = None,
    cfg: Bm25Config | None = None,
    resume: bool = False,
    id_partitions: int | None = None,
) -> str:
    """Build the full index artifact set under ``index_dir``.

    ``order_cols`` must be a unique key of ``docs``; it defines the
    (deterministic) dense doc-id order. ``payload_cols`` are carried
    into the docs artifact and returned by searches (default:
    order_cols).
    """
    cfg = cfg or Bm25Config()
    payload_cols = payload_cols or list(order_cols)

    docs_path = fsio.join(index_dir, "docs")
    maps_path = fsio.join(index_dir, "mappings")

    if not resume and fsio.exists(index_dir):
        fsio.rmtree(index_dir)
    fsio.mkdirs(index_dir)

    # ---- stage 1: docs + mappings staging -------------------------------
    if not (resume and _stage_done(docs_path) and _stage_done(maps_path)):
        src = docs.filter(F.col(text_col).isNotNull())
        keep = list(dict.fromkeys([*order_cols, *payload_cols, text_col]))
        src = src.select(*keep)
        # payloads are stored under p_<name> so they can never collide
        # with the engine's internal doc_id column
        for c in payload_cols:
            src = src.withColumn(f"p_{c}", F.col(c))
        n_rows_hint = id_partitions or max(
            spark.sparkContext.defaultParallelism, 32
        )
        # ids are a function of order_cols only — assign them *before*
        # tokenizing so the counts pass doesn't run the analyzer UDF
        # (tokenization then happens exactly once, under the persist)
        assigned = _assign_doc_ids(spark, src, order_cols, n_rows_hint)
        with_ids = with_doc_terms(assigned, text_col, cfg.analyzer, cfg.seed)
        with_ids = (
            with_ids.withColumn(
                "shard", (F.col("_iid") / cfg.shard_size).cast("int")
            )
            .withColumn(
                "local_id",
                # int: shard_size <= 2^31 (u32 posting domain) — half
                # the staging width of a long
                (F.col("_iid") % cfg.shard_size).cast("int"),
            )
            .withColumn("content_sha256", F.sha2(F.col(text_col), 256))
            # quantize once per document, before the mappings explode
            .withColumn("fieldnorm", _fieldnorm_expr())
            # the raw text is fully consumed (terms + sha) — keep it
            # out of the cache, it is by far the widest column
            .drop(text_col)
        )
        with_ids.persist()

        docs_art = with_ids.select(
            F.col("_iid").alias("doc_id"),
            "shard",
            "local_id",
            F.col("doc_len").cast("long").alias("doc_len"),
            "fieldnorm",
            "content_sha256",
            *[f"p_{c}" for c in payload_cols],
        )
        (
            docs_art
            # already range-partitioned + sorted by id (ids were
            # assigned in the order_cols range shuffle) — write as-is,
            # no second shuffle; row groups stay doc_id-clustered for
            # the per-shard fieldnorm reads
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(docs_path)
        )
        _ensure_readable_parquet(docs_path, docs_art.schema)
        # the exploded mappings staging parquet exists for resume and
        # vacuum (they re-enter through finalize_index's mappings
        # path); it reads the already-materialized cache, so it can
        # run concurrently with stage 3 instead of serializing ~10s
        # of parquet IO in front of it
        def _write_mappings():
            m = with_ids.select(
                F.explode("terms").alias("t"),
                "shard",
                "local_id",
                "fieldnorm",
            ).select(
                F.col("t.key").alias("term_key"),
                "shard",
                "local_id",
                F.col("t.tf").alias("tf"),
                "fieldnorm",
            )
            m.write.mode("overwrite").parquet(maps_path)
            _ensure_readable_parquet(maps_path, m.schema)

        from concurrent.futures import ThreadPoolExecutor

        # stage 3 consumes the cached frame doc-grouped (one compact
        # row per document through the shard shuffle)
        doc_terms = with_ids.select(
            F.col("terms").getField("key").alias("tkeys"),
            F.col("terms").getField("tf").alias("ttfs"),
            "shard",
            F.col("local_id").cast("int").alias("local_id"),
            F.col("fieldnorm").cast("int").alias("fieldnorm"),
        )
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(_write_mappings)
            out = finalize_index(
                spark, index_dir, cfg, payload_cols, resume=resume,
                doc_terms_df=doc_terms,
            )
            fut.result()
        with_ids.unpersist()
        return out

    return finalize_index(spark, index_dir, cfg, payload_cols, resume=resume)


def finalize_index(
    spark: SparkSession,
    index_dir: str,
    cfg: Bm25Config,
    payload_cols: list[str],
    resume: bool = False,
    mappings_df: DataFrame | None = None,
    doc_terms_df: DataFrame | None = None,
) -> str:
    """Stages 2-5 over already-written docs/mappings artifacts.

    Shared by the initial build and by vacuum compaction (which writes
    relabeled docs/mappings artifacts itself — the reference's maintain
    re-runs exactly the sort+flush stages on the merged stream,
    maintain.rs:27-311).

    ``doc_terms_df``: doc-grouped posting source (tkeys, ttfs, shard,
    local_id, fieldnorm — one row per document) used by the initial
    build's hot path; when absent, stage 3 reads the exploded mappings
    staging (resume / vacuum)."""
    docs_path = fsio.join(index_dir, "docs")
    maps_path = fsio.join(index_dir, "mappings")
    postings_path = fsio.join(index_dir, "postings")
    terms_path = fsio.join(index_dir, "terms")
    lineage_path = fsio.join(index_dir, "lineage")
    meta_path = fsio.join(index_dir, "meta.json")

    # ---- stage 2: corpus stats ------------------------------------------
    docs_art = spark.read.parquet(docs_path)
    n_docs, sum_dl = docs_art.agg(
        F.count("*"), F.sum("doc_len")
    ).first()
    n_docs = int(n_docs)
    sum_dl = int(sum_dl or 0)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0

    # ---- stage 3: postings ----------------------------------------------
    if not (resume and _stage_done(postings_path)):
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        if doc_terms_df is not None:
            # hot path: shuffle one compact row per doc, cluster whole
            # shards per task (a shard contains complete (term, shard)
            # groups, so block output is identical to the mappings path)
            blocks = doc_terms_df.repartition(n_part, "shard").mapInArrow(
                _build_blocks_docs_fn(cfg, avgdl, cfg.term_buckets),
                POSTINGS_SCHEMA,
            )
        else:
            mappings = (
                mappings_df
                if mappings_df is not None
                else spark.read.parquet(maps_path)
            )
            # hash-cluster by (term_key, shard); the kernel lexsorts its
            # partition itself (NumPy sort beats a Spark sort it would
            # redo anyway)
            blocks = mappings.repartition(
                n_part, "term_key", "shard"
            ).mapInPandas(
                _build_blocks_fn(cfg, avgdl, cfg.term_buckets), POSTINGS_SCHEMA
            )
        (
            blocks.repartition("bucket")
            .sortWithinPartitions("term_key", "shard", "block_ord")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(postings_path)
        )
        _ensure_readable_parquet(
            postings_path,
            StructType([f for f in POSTINGS_SCHEMA.fields if f.name != "bucket"]),
            subdir="bucket=0",
        )

    # ---- stages 4 + lineage: three independent jobs over the written
    # postings artifact, submitted from threads so the scheduler
    # overlaps them (each is small; serializing them just stacks their
    # fixed per-job latency) -------------------------------------------
    postings = spark.read.parquet(postings_path)

    def _write_terms():
        terms = postings.groupBy("term_key").agg(
            F.first("bucket").alias("bucket"),
            F.sum("count").cast("long").alias("df"),
            F.max_by(
                F.struct("wand_fn", "wand_tf"),
                # total order: block_ub desc-pick, then earliest block,
                # then lowest shard — (term_key, shard, block_ord) is a
                # unique key, so two shards tying on (block_ub,
                # block_ord) can no longer produce run-to-run variance
                # in the stored (wand_fn, wand_tf)
                F.struct(
                    "block_ub", F.col("block_ord") * -1, F.col("shard") * -1
                ),
            ).alias("w"),
            F.max("block_ub").alias("token_ub"),
        )
        tsel = terms.select(
            "term_key",
            "bucket",
            "df",
            F.col("w.wand_fn").alias("wand_fn"),
            F.col("w.wand_tf").alias("wand_tf"),
            "token_ub",
        )
        (
            tsel
            # a handful of sorted files: parallel write, and the query
            # path's Arrow key filter prunes by row-group stats (no
            # serial single-partition sort — dictionaries can be huge)
            .repartitionByRange(max(1, cfg.term_buckets // 16), "term_key")
            .sortWithinPartitions("term_key")
            .write.mode("overwrite")
            .parquet(terms_path)
        )
        _ensure_readable_parquet(terms_path, tsel.schema)

    def _write_lineage():
        lineage = postings.groupBy("shard").agg(
            F.count("*").alias("n_blocks"),
            F.sum("count").cast("long").alias("n_postings"),
            (
                F.sum(F.length("ids_bytes")) + F.sum(F.length("tfs_bytes"))
            ).alias("packed_bytes"),
            F.count_distinct("term_key").alias("n_terms"),
        )
        shard_docs = docs_art.groupBy("shard").agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_len").cast("long").alias("sum_dl"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.expr("bit_xor(xxhash64(content_sha256))").alias("input_fingerprint"),
        )
        joined = lineage.join(shard_docs, "shard", "full").orderBy("shard")
        joined.write.mode("overwrite").parquet(lineage_path)
        _ensure_readable_parquet(lineage_path, joined.schema)

    def _write_bucket_lineage():
        # second lineage axis: per term-bucket rows (term range, block/
        # posting/byte counts) — the "term range" granularity of the
        # build, one row per postings output directory
        bl = (
            postings.groupBy("bucket")
            .agg(
                F.min("term_key").alias("min_term_key"),
                F.max("term_key").alias("max_term_key"),
                F.count_distinct("term_key").alias("n_terms"),
                F.count("*").alias("n_blocks"),
                F.sum("count").cast("long").alias("n_postings"),
                (
                    F.sum(F.length("ids_bytes")) + F.sum(F.length("tfs_bytes"))
                ).alias("packed_bytes"),
            )
            .orderBy("bucket")
        )
        bl.write.mode("overwrite").parquet(lineage_path + "_buckets")
        _ensure_readable_parquet(lineage_path + "_buckets", bl.schema)

    tasks = []
    if not (resume and _stage_done(terms_path)):
        tasks.append(_write_terms)
    if not (resume and _stage_done(lineage_path)):
        tasks.append(_write_lineage)
        tasks.append(_write_bucket_lineage)
    # BM25SPARK_FINALIZE_PARALLEL=0 forces sequential execution (A/B
    # lever: overlapping helps when cores outnumber a single job's
    # tasks, hurts when the pinned core budget is already saturated)
    if os.environ.get("BM25SPARK_FINALIZE_PARALLEL", "1") == "0":
        for t in tasks:
            t()
    elif tasks:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(tasks)) as pool:
            futures = [pool.submit(t) for t in tasks]
            for fu in futures:
                fu.result()  # re-raise any job failure

    # id-density invariant over the *written* lineage (no extra scan):
    # within a shard, ids must be the dense range [min, max] — catches
    # any id-assignment fault. Cheap, so it runs on resume too.
    import pyarrow.dataset as _ds

    lt = _ds.dataset(lineage_path, format="parquet").to_table(
        columns=["shard", "n_docs", "min_doc_id", "max_doc_id"]
    )
    bad = [
        int(lt["shard"][i].as_py())
        for i in range(lt.num_rows)
        if lt["max_doc_id"][i].as_py() - lt["min_doc_id"][i].as_py() + 1
        != lt["n_docs"][i].as_py()
    ]
    if bad:
        raise RuntimeError(
            f"doc-id assignment produced non-dense ids in shards {bad[:10]}"
        )

    # ---- stage 5: meta (publish-last) ------------------------------------
    import pyarrow.dataset as _ds

    n_terms = _ds.dataset(terms_path, format="parquet").count_rows()
    meta = {
        "magic": FORMAT_MAGIC,
        "version": FORMAT_VERSION,
        "k1": cfg.k1,
        "b": cfg.b,
        "seed": cfg.seed.hex(),
        "analyzer": cfg.analyzer,
        # behavior fingerprint of the analyzer at build time (wordlist
        # hash for dictionary analyzers) — verified at open so the
        # same NAME with a different wordlist cannot silently tokenize
        # queries unlike the indexed corpus
        "analyzer_fingerprint": _analyzer_fingerprint(cfg.analyzer),
        "shard_size": cfg.shard_size,
        "term_buckets": cfg.term_buckets,
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "n_terms": int(n_terms),
        "payload_cols": payload_cols,
        "paths": {
            "docs": "docs",
            "postings": "postings",
            "terms": "terms",
            "lineage": "lineage",
            "lineage_buckets": "lineage_buckets",
            "mappings": "mappings",
        },
    }
    fsio.write_text_atomic(meta_path, json.dumps(meta, indent=2))
    return index_dir


def _fieldnorm_expr():
    """length_to_fieldnorm as a Catalyst expression: index of the last
    table entry <= doc_len (the reference's binary search,
    bm25.rs:278-283). Emitted as an 8-level nested-CASE binary search —
    whole-stage-codegen evaluates ~8 comparisons per row, where a
    higher-order aggregate over a 256-literal array would run 256
    interpreted steps per row."""
    from .fieldnorm import FIELDNORM_TO_LENGTH

    table = [int(v) for v in FIELDNORM_TO_LENGTH]
    dl = F.col("doc_len")

    def search(lo: int, hi: int):
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return (
            F.when(dl >= F.lit(table[mid]), search(mid, hi))
            .otherwise(search(lo, mid - 1))
        )

    return search(0, len(table) - 1).cast("int")
