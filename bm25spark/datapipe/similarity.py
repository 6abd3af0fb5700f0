"""Similarity search over the embeddings table.

- :func:`ann_cosine_topk` — brute-force cosine top-k for a probe set,
  all in built-in expressions (zip_with dot product in whole-stage
  codegen). The exactness baseline; at scale the probe set broadcasts
  and the scan is embarrassingly parallel.
- :func:`ann_lsh_topk` — scale path #1: multi-table, banded,
  multiprobe sign-random-projection LSH with *integer-exact* hashing,
  so the full pipeline (bucket bits included) is reproduced bit-for-bit
  by a DuckDB oracle and the driver gate hash-checks it like every
  exact operator. Recall vs the brute force is additionally gated in
  pytest; :func:`build_lsh_index` persists the bucket table partitioned
  by bucket for directory-pruned (sublinear-I/O) serving.
- :func:`ann_ivf_topk` — scale path #2 (IVF): deterministic k-means
  centroids as cross-engine parameters + integer-exact nearest-centroid
  assignment; same oracle-exactness property.
- :func:`embedding_near_dup_pairs` — the dedup-family member: banded
  LSH candidate pairs + exact cosine-threshold verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .util import SPREAD_MIN_BYTES_LIGHT, spread_small_scan

PROBES = list(range(10))
K = 10


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_cosine_topk(emb: DataFrame, probes=None, k: int = K) -> DataFrame:
    """Brute-force cosine top-k, pure Catalyst. r7 optimization:
    each side's norm is computed ONCE per row (identical expression,
    so identical float64) instead of once per (probe, vec) pair
    inside _cosine, and the corpus scan is spread — only the dot
    product remains per-pair work."""
    probes = probes if probes is not None else PROBES
    p = (
        emb.filter(F.col("vec_id").isin(probes))
        .select(
            F.col("vec_id").alias("probe_id"),
            _as_double(F.col("embedding")).alias("pe"),
        )
        .select("probe_id", "pe", _norm(F.col("pe")).alias("_pn"))
    )
    pairs = F.broadcast(p).crossJoin(
        spread_small_scan(emb, min_bytes=SPREAD_MIN_BYTES_LIGHT)
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            _as_double(F.col("embedding")).alias("e"),
        )
        .select("vec_id", "e", _norm(F.col("e")).alias("_en"))
    )
    scored = pairs.select(
        F.col("probe_id").cast("bigint").alias("probe_id"),
        "vec_id",
        F.round(
            _dot(F.col("pe"), F.col("e")) / (F.col("_pn") * F.col("_en")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


def ann_cosine_topk_sql(probes=None, k: int = K) -> str:
    probes = probes if probes is not None else PROBES
    plist = ", ".join(str(p) for p in probes)
    return f"""
WITH p AS (
  SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pe
  FROM embeddings WHERE vec_id IN ({plist})
),
scored AS (
  SELECT p.probe_id::BIGINT AS probe_id, e.vec_id::BIGINT AS vec_id,
         round(
           list_dot_product(p.pe, e.embedding::DOUBLE[])
           / (sqrt(list_dot_product(p.pe, p.pe))
              * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
           6) AS cos
  FROM p CROSS JOIN embeddings e
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT probe_id, vec_id, cos FROM ranked WHERE rn <= {k}
ORDER BY probe_id, cos DESC, vec_id
"""


def ann_cosine_topk_kernel(
    emb: DataFrame, probes=None, k: int = K
) -> DataFrame:
    """The scale path for exact cosine top-k: the probe matrix is tiny
    (q x d, broadcast), the corpus scan is embarrassingly parallel —
    each Arrow batch computes one NumPy matmul and keeps only its
    partition-local top-k per probe, so the shuffle into the global
    window carries O(partitions * q * k) rows regardless of corpus
    size. Rank-identical to :func:`ann_cosine_topk` (same rounding,
    same tie order); that Catalyst form stays as the oracle.
    """
    import pandas as pd

    probes = probes if probes is not None else PROBES
    spark = emb.sparkSession
    pr = (
        emb.filter(F.col("vec_id").isin(probes))
        .select("vec_id", "embedding")
        .collect()
    )
    probe_ids = np.array([r.vec_id for r in pr], dtype=np.int64)
    pm = np.array([r.embedding for r in pr], dtype=np.float64)
    pm_unit = pm / np.linalg.norm(pm, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(probe_ids)
    b_pm = spark.sparkContext.broadcast(pm_unit)

    def score(batches):
        ids, mat = b_ids.value, b_pm.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
            cos = np.round(mat @ vecs.T, 6)  # q x n
            vid = pdf["vec_id"].to_numpy(np.int64)
            out = []
            kk = min(k, cos.shape[1])
            for qi in range(len(ids)):
                row = cos[qi]
                # partition-local top-k (ties by vec_id asc like the
                # global sort, so no survivor can be dropped early)
                order = np.lexsort((vid, -row))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "probe_id": ids[qi],
                            "vec_id": vid[order],
                            "cos": row[order],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    partial = spread_small_scan(emb, min_bytes=SPREAD_MIN_BYTES_LIGHT).select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    ).mapInPandas(score, "probe_id bigint, vec_id bigint, cos double")
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


# ---------------------------------------------------------------------------
# Sign-random-projection LSH (multi-table, banded, multiprobe)
#
# Scale design: L tables x B bits. Bucket assignment is ONE corpus scan
# through an Arrow-batched NumPy matmul against a broadcast int16
# hyperplane matrix (survives d=1024: the planes live in a broadcast
# var, not in expression literals). Candidates come from a broadcast
# hash-equi-join on (table, bucket) — codegen, no nested loop — then an
# exact cosine re-rank over only the candidate set. Expected scan
# fraction per probe ~ L * (1 + B) / 2^B (own bucket + Hamming-1
# multiprobe), e.g. L=8, B=16 -> ~0.1% of the corpus; B scales with
# log2(n) via lsh_bits_for(). `build_lsh_index` persists the bucket
# table partitioned by tagged bucket so a serving query reads only its
# candidate buckets' *directories* (partition pruning — sublinear I/O,
# same design as the bm25 postings artifact).
#
# Determinism contract (what makes the DuckDB oracle exact): embeddings
# are quantized with floor(x * QUANT) where QUANT is a power of two
# (exponent shift — exact in float64), planes are int16, and every
# dot product is a sum of integers < 2^53, so the sign — hence every
# bucket bit — is bit-identical in NumPy, Catalyst, and DuckDB.
# ---------------------------------------------------------------------------

LSH_TABLES = 4
LSH_QUANT = 1024  # power of two -> floor(x*QUANT) exact in f64


def lsh_bits_for(n: int, target_bucket: int = 64, lo: int = 8, hi: int = 24) -> int:
    """Bits per table so the expected bucket occupancy ~= target:
    B = log2(n / target_bucket), clamped. 500 docs -> 8; 1e9 -> 24."""
    import math

    return int(min(hi, max(lo, math.ceil(math.log2(max(n, 2) / target_bucket)))))


def lsh_planes(dim: int, n_planes: int, seed: str = "bm25spark-lsh") -> np.ndarray:
    """Deterministic int16 hyperplane matrix (n_planes x dim) from an
    md5 counter stream — regenerated verbatim by the SQL oracle
    generator, executors (via broadcast), and tests."""
    need = n_planes * dim * 2
    buf = bytearray()
    ctr = 0
    while len(buf) < need:
        buf += hashlib.md5(f"{seed}:{ctr}".encode()).digest()
        ctr += 1
    return (
        np.frombuffer(bytes(buf[:need]), dtype="<i2")
        .reshape(n_planes, dim)
        .astype(np.int64)
    )


def _tagged_buckets(
    vecs: np.ndarray, planes: np.ndarray, bits: int, tables: int, quant: int
) -> np.ndarray:
    """(n, dim) float64 -> (n, tables) tagged bucket ids
    (table << bits | bucket). Integer-exact: see the determinism
    contract above."""
    q = np.floor(vecs * float(quant))
    dots = q @ planes.T  # (n, tables*bits); integer-valued f64, exact
    sign = (dots > 0).astype(np.int64)
    out = np.zeros((len(vecs), tables), dtype=np.int64)
    for t in range(tables):
        b = np.zeros(len(vecs), dtype=np.int64)
        for j in range(bits):
            b |= sign[:, t * bits + j] << j
        out[:, t] = (t << bits) | b
    return out


def _probe_bucket_rows(
    probe_ids: np.ndarray,
    tagged: np.ndarray,
    bits: int,
    multiprobe: int = 1,
) -> list[tuple[int, int]]:
    """(probe_id, tagged bucket) rows: own bucket per table, plus every
    Hamming-1 neighbor when ``multiprobe`` >= 1."""
    rows = []
    mask = (1 << bits) - 1
    for pid, tbs in zip(probe_ids.tolist(), tagged.tolist()):
        for tb in tbs:
            rows.append((pid, tb))
            if multiprobe >= 1:
                tag, b = tb & ~mask, tb & mask
                for j in range(bits):
                    rows.append((pid, tag | (b ^ (1 << j))))
    return sorted(set(rows))


def lsh_tagged_df(
    emb: DataFrame,
    planes: np.ndarray,
    bits: int,
    tables: int,
    quant: int = LSH_QUANT,
) -> DataFrame:
    """One corpus scan -> (vec_id, tb) exploded bucket assignment."""
    import pandas as pd

    spark = emb.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)

    def assign(batches):
        pl = b_planes.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            tagged = _tagged_buckets(vecs, pl, bits, tables, quant)
            vid = pdf["vec_id"].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vid, tables),
                    "tb": tagged.reshape(-1),
                }
            )

    return spread_small_scan(emb, min_bytes=SPREAD_MIN_BYTES_LIGHT).select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    ).mapInPandas(assign, "vec_id bigint, tb bigint")


def ann_lsh_topk(
    emb: DataFrame,
    probes=None,
    k: int = K,
    bits: int | None = None,
    tables: int = LSH_TABLES,
    multiprobe: int = 1,
    quant: int = LSH_QUANT,
) -> DataFrame:
    """Banded multi-table LSH ANN: candidates = vectors sharing any
    table's bucket (or a Hamming-1 neighbor) with the probe, re-ranked
    by exact cosine. Same output convention as :func:`ann_cosine_topk`
    — and, unlike classic float LSH, *exactly* reproducible by the SQL
    oracle (:func:`ann_lsh_topk_sql`) thanks to the integer hashing.

    ``bits`` defaults to :func:`lsh_bits_for` (corpus-size-scaled);
    the driver-gate entry pins bits=8 because its oracle SQL is a
    static string."""
    probes = probes if probes is not None else PROBES
    spark = emb.sparkSession
    if bits is None:
        bits = lsh_bits_for(emb.count())

    pr = (
        emb.filter(F.col("vec_id").isin(probes))
        .select("vec_id", "embedding")
        .collect()
    )
    if not pr:
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cos double"
        )
    dim = len(pr[0].embedding)
    planes = lsh_planes(dim, tables * bits)
    pids = np.array([r.vec_id for r in pr], dtype=np.int64)
    pmat = np.array([r.embedding for r in pr], dtype=np.float64)
    probe_df = spark.createDataFrame(
        _probe_bucket_rows(pids, _tagged_buckets(pmat, planes, bits, tables, quant),
                           bits, multiprobe),
        "probe_id bigint, tb bigint",
    )

    tagged = lsh_tagged_df(emb, planes, bits, tables, quant)
    cands = (
        tagged.join(F.broadcast(probe_df), "tb")
        .select("probe_id", "vec_id")
        .distinct()
    )

    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("e"),
    )
    pemb = base.filter(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    scored = (
        F.broadcast(cands)
        .join(base, "vec_id")
        .join(F.broadcast(pemb), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(_cosine(F.col("pe"), F.col("e")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


def build_lsh_index(
    emb: DataFrame,
    index_dir: str,
    bits: int | None = None,
    tables: int = LSH_TABLES,
    quant: int = LSH_QUANT,
) -> dict:
    """Persist the bucket table partitioned by tagged bucket — the
    serving-scale artifact. A query then reads only its candidate
    buckets' *directories* (Parquet partition pruning), so candidate
    I/O is O(candidates), not O(corpus) — the same sublinear-read
    design as the bm25 postings artifact. Embeddings ride inside each
    bucket dir (x`tables` duplication) so the re-rank needs no second
    corpus join; a plain ``vectors`` artifact (sorted by vec_id) serves
    probe lookups with row-group pruning."""
    import json
    import os

    import pandas as pd

    spark = emb.sparkSession
    n = emb.count()
    bits = bits if bits is not None else lsh_bits_for(n)
    dim = len(emb.select("embedding").first()[0])
    planes = lsh_planes(dim, tables * bits)
    b_planes = spark.sparkContext.broadcast(planes)

    def assign(batches):
        pl = b_planes.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            tagged = _tagged_buckets(vecs, pl, bits, tables, quant)
            out = pdf.loc[pdf.index.repeat(tables)].reset_index(drop=True)
            out["tb"] = tagged.reshape(-1)
            yield pd.DataFrame(
                {
                    "vec_id": out["vec_id"],
                    "tb": out["tb"],
                    "embedding": out["embedding"],
                }
            )

    src = spread_small_scan(emb, min_bytes=SPREAD_MIN_BYTES_LIGHT).select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    )
    (
        src.mapInPandas(assign, "vec_id bigint, tb bigint, embedding array<float>")
        .repartition("tb")
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(os.path.join(index_dir, "buckets"))
    )
    (
        src.repartitionByRange(max(1, n // 65536 or 1), "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "vectors"))
    )
    meta = {"bits": bits, "tables": tables, "quant": quant, "dim": dim, "n": n}
    with open(os.path.join(index_dir, "lsh_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ann_lsh_topk_indexed(
    spark,
    index_dir: str,
    probes=None,
    k: int = K,
    multiprobe: int = 1,
) -> DataFrame:
    """Serve ANN from a persisted :func:`build_lsh_index` artifact.
    Reads ONLY the probe's candidate bucket directories (partition
    pruning on ``tb`` — check PartitionFilters in the plan), then the
    same exact-cosine re-rank. Result-identical to the in-memory
    :func:`ann_lsh_topk` with the same parameters (tested)."""
    import json
    import os

    probes = probes if probes is not None else PROBES
    with open(os.path.join(index_dir, "lsh_meta.json")) as f:
        meta = json.load(f)
    bits, tables, quant = meta["bits"], meta["tables"], meta["quant"]
    planes = lsh_planes(meta["dim"], tables * bits)

    pr = (
        spark.read.parquet(os.path.join(index_dir, "vectors"))
        .filter(F.col("vec_id").isin(probes))
        .collect()
    )
    if not pr:
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cos double"
        )
    pids = np.array([r.vec_id for r in pr], dtype=np.int64)
    pmat = np.array([r.embedding for r in pr], dtype=np.float64)
    rows = _probe_bucket_rows(
        pids, _tagged_buckets(pmat, planes, bits, tables, quant), bits, multiprobe
    )
    probe_df = spark.createDataFrame(rows, "probe_id bigint, tb bigint")
    wanted = sorted({tb for _, tb in rows})

    buckets = spark.read.parquet(os.path.join(index_dir, "buckets"))
    cands = (
        # .isin on the partition column -> directory-level pruning
        buckets.filter(F.col("tb").isin(wanted))
        .join(F.broadcast(probe_df), "tb")
        .select("probe_id", "vec_id", _as_double(F.col("embedding")).alias("e"))
        .dropDuplicates(["probe_id", "vec_id"])
    )
    pemb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(pids, pmat)],
        "probe_id bigint, pe array<double>",
    )
    scored = cands.join(F.broadcast(pemb), "probe_id").select(
        "probe_id",
        "vec_id",
        F.round(_cosine(F.col("pe"), F.col("e")), 6).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path the brief names
# ("an IVF or LSH-bucketed variant"). Same determinism design as the
# LSH: the k-means *training* runs once on the driver (over a sample at
# scale) and its integer-rounded centroids become parameters embedded
# in both engines — broadcast to executors, literals in the oracle SQL
# — while the *assignment* (nearest centroid by squared L2 over the
# quantized integer vectors, ties to the lowest centroid id) is pure
# integer arithmetic, bit-identical in NumPy and DuckDB. So even this
# approximate index is hash-checked exactly by the driver gate.
# ---------------------------------------------------------------------------

IVF_CLUSTERS = 16
IVF_NPROBE = 3


def _sq_dists(q: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, dim) x (k, dim) integer matrices -> (n, k) squared-L2
    distances via the ||q||^2 - 2 q.c + ||c||^2 expansion as a float64
    matmul. O(n*k) output instead of the naive broadcast's O(n*k*dim)
    tensor (which at sample=65536, k=16, d=768 was a ~6.4 GB transient
    on the driver). Exact: every product and partial sum is an integer
    < 2^53 (|q|,|c| <= ~quant * max|x|), so BLAS float64 arithmetic
    returns the same int64 distances the naive form did, preserving
    the first-min tie rule bit-for-bit."""
    qf = q.astype(np.float64)
    cf = c.astype(np.float64)
    d = (
        (qf * qf).sum(axis=1)[:, None]
        - 2.0 * (qf @ cf.T)
        + (cf * cf).sum(axis=1)[None, :]
    )
    return d.astype(np.int64)


def ivf_train(
    vecs: np.ndarray, k: int = IVF_CLUSTERS, iters: int = 10, quant: int = LSH_QUANT
) -> np.ndarray:
    """Deterministic k-means over quantized integer vectors -> integer
    centroids (k, dim) int64. Init = evenly-strided rows of the input
    (callers pass rows sorted by vec_id); empty clusters keep their
    previous centroid. At scale, train on a bounded sample — the
    centroids are parameters, not data."""
    q = np.floor(vecs.astype(np.float64) * float(quant)).astype(np.int64)
    idx = np.linspace(0, len(q) - 1, num=min(k, len(q))).astype(int)
    c = q[idx].copy()
    qf = q.astype(np.float64)
    # hoisted across iterations (r7: _sq_dists re-converted and
    # re-normed the SAME q every round — the astype copies and
    # ||q||^2 sums were most of the training time). The inlined
    # expansion is the exact _sq_dists math: every product and
    # partial sum is an integer < 2^53, so the distances — and the
    # first-min tie rule — are bit-identical in any operation order.
    qn = (qf * qf).sum(axis=1)[:, None]
    kk = len(c)
    for _ in range(iters):
        cf = c.astype(np.float64)
        d = qn - 2.0 * (qf @ cf.T) + (cf * cf).sum(axis=1)[None, :]
        # d's float64 entries ARE the exact integer distances, so
        # argmin over them (first-min tie rule) equals argmin over
        # the int64 cast — no per-iteration cast needed
        a = d.argmin(axis=1)
        # vectorized centroid update (r7: the per-cluster boolean-mask
        # loop was O(n*k) per iteration): per-cluster sums via ONE
        # one-hot matmul are exact — every partial sum is an integer
        # well under 2^53, so any accumulation order yields the same
        # value — and sum/count/round reproduce members.mean()
        # bit-for-bit, leaving the trained centroids unchanged
        counts = np.bincount(a, minlength=kk)
        if q.shape[1] >= 32:
            # wide vectors: one BLAS matmul beats dim bincount calls
            onehot = np.zeros((len(a), kk), dtype=np.float64)
            onehot[np.arange(len(a)), a] = 1.0
            sums = (qf.T @ onehot).T
        else:
            # narrow subspaces (PQ residuals): per-dim bincounts win
            sums = np.stack(
                [
                    np.bincount(a, weights=qf[:, dd], minlength=kk)
                    for dd in range(q.shape[1])
                ],
                axis=1,
            )
        nonempty = counts > 0
        c[nonempty] = np.round(
            sums[nonempty] / counts[nonempty, None]
        ).astype(np.int64)
    return c


def _ivf_assign(vecs: np.ndarray, centroids: np.ndarray, quant: int) -> np.ndarray:
    """(n, dim) float64 -> nearest-centroid ids, integer-exact: squared
    L2 over floor(x*quant) vs integer centroids, first-min tie rule."""
    q = np.floor(vecs.astype(np.float64) * float(quant)).astype(np.int64)
    return _sq_dists(q, centroids).argmin(axis=1).astype(np.int64)


def _ivf_probe_lists(
    pmat: np.ndarray, centroids: np.ndarray, quant: int, nprobe: int
) -> list[list[int]]:
    """Per-probe nprobe nearest centroid ids, ties by centroid id."""
    q = np.floor(pmat.astype(np.float64) * float(quant)).astype(np.int64)
    d = _sq_dists(q, centroids)
    out = []
    for row in d:
        order = np.lexsort((np.arange(len(row)), row))[:nprobe]
        out.append([int(x) for x in order])
    return out


def ann_ivf_topk(
    emb: DataFrame,
    probes=None,
    k: int = K,
    n_clusters: int = IVF_CLUSTERS,
    nprobe: int = IVF_NPROBE,
    quant: int = LSH_QUANT,
    train_sample: int = 65536,
) -> DataFrame:
    """IVF ANN: one corpus scan assigns every vector to its nearest
    centroid (Arrow-batched integer matmul against broadcast
    centroids); candidates = vectors in the probe's ``nprobe`` nearest
    clusters; exact rounded-cosine re-rank. Output convention and
    oracle-exactness identical to :func:`ann_lsh_topk` — expected scan
    fraction ~ nprobe / n_clusters."""
    import pandas as pd

    probes = probes if probes is not None else PROBES
    spark = emb.sparkSession

    train = emb.orderBy("vec_id").limit(train_sample).toPandas()
    tmat = np.array(train["embedding"].to_list(), dtype=np.float64)
    centroids = ivf_train(tmat, n_clusters, quant=quant)
    b_cent = spark.sparkContext.broadcast(centroids)

    # probes always come from their own pruned read — reusing the
    # training sample would silently drop any probe outside it
    pr = sorted(
        emb.filter(F.col("vec_id").isin(probes)).collect(),
        key=lambda r: r.vec_id,
    )
    if not pr:
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cos double"
        )
    pids = [int(r.vec_id) for r in pr]
    pmat = np.array([r.embedding for r in pr], dtype=np.float64)
    plists = _ivf_probe_lists(pmat, centroids, quant, nprobe)
    probe_df = spark.createDataFrame(
        [(pid, cid) for pid, cids in zip(pids, plists) for cid in cids],
        "probe_id bigint, cid bigint",
    )

    def assign(batches):
        cent = b_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(np.int64),
                    "cid": _ivf_assign(vecs, cent, quant),
                }
            )

    assigned = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    ).mapInPandas(assign, "vec_id bigint, cid bigint")
    cands = (
        assigned.join(F.broadcast(probe_df), "cid")
        .select("probe_id", "vec_id")
        .distinct()
    )
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("e"),
    )
    pemb = base.filter(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    scored = (
        F.broadcast(cands)
        .join(base, "vec_id")
        .join(F.broadcast(pemb), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(_cosine(F.col("pe"), F.col("e")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


def ann_ivf_topk_sql(
    centroids: np.ndarray,
    probes=None,
    k: int = K,
    nprobe: int = IVF_NPROBE,
    quant: int = LSH_QUANT,
) -> str:
    """DuckDB oracle for :func:`ann_ivf_topk`: the trained centroids
    arrive as literals (parameters, like the LSH planes); assignment,
    probe lists, candidate join and re-rank replicate the Spark
    pipeline exactly in integer arithmetic."""
    probes = probes if probes is not None else PROBES
    plist = ", ".join(str(p) for p in probes)
    nk = len(centroids)
    cent_lits = ", ".join(
        "[" + ",".join(str(int(v)) + ".0" for v in c) + "]" for c in centroids
    )
    # per-vector distance list to every centroid: |q-c|^2 = q.q - 2 q.c + c.c
    dists = ", ".join(
        f"list_dot_product(q, q) - 2*list_dot_product(q, c[{j + 1}])"
        f" + list_dot_product(c[{j + 1}], c[{j + 1}])"
        for j in range(nk)
    )
    return f"""
WITH base AS (
  SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
cent(c) AS (SELECT [{cent_lits}]),
qe AS (
  SELECT vec_id, list_transform(e, x -> floor(x * {quant}.0)) AS q FROM base
),
dv AS (
  SELECT vec_id, [{dists}] AS d FROM qe CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, list_position(d, list_min(d)) - 1 AS cid FROM dv
),
pc AS (
  SELECT vec_id AS probe_id, j.j AS cid,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY list_extract(d, j.j + 1), j.j
         ) AS rnk
  FROM dv CROSS JOIN (SELECT unnest(range({nk})) AS j) j
  WHERE vec_id IN ({plist})
),
probe_cids AS (SELECT probe_id, cid FROM pc WHERE rnk <= {nprobe}),
cands AS (
  SELECT DISTINCT probe_cids.probe_id, assigned.vec_id
  FROM probe_cids JOIN assigned USING (cid)
),
scored AS (
  SELECT cnd.probe_id, cnd.vec_id,
         round(
           list_dot_product(p.e, v.e)
           / (sqrt(list_dot_product(p.e, p.e))
              * sqrt(list_dot_product(v.e, v.e))),
           6) AS cos
  FROM cands cnd
  JOIN base v ON cnd.vec_id = v.vec_id
  JOIN base p ON cnd.probe_id = p.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT probe_id, vec_id, cos FROM ranked WHERE rn <= {k}
ORDER BY probe_id, cos DESC, vec_id
"""


NEAR_DUP_THRESHOLD = 0.4


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    bits: int | None = None,
    tables: int = LSH_TABLES,
    quant: int = LSH_QUANT,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the last of the prompt's
    dedup family: candidates from the integer-exact multi-table LSH
    (vectors sharing any table's bucket; a banded self-join, never the
    all-pairs cross join), verified by exact rounded cosine >=
    ``threshold``. Canonical (a < b) pair order. Like every LSH-based
    dedup here, candidate recall on isotropic data is bounded by the
    banding (high-cosine pairs collide with probability
    1-(1-(1-θ/π)^B)^L, far above chance); the DuckDB oracle reproduces
    the *same* candidates bit-for-bit, so the gate is exact."""
    spark = emb.sparkSession
    if bits is None:
        bits = lsh_bits_for(emb.count())
    dim = len(emb.select("embedding").first()[0])
    planes = lsh_planes(dim, tables * bits)

    tagged = lsh_tagged_df(emb, planes, bits, tables, quant)
    a = tagged.select(F.col("vec_id").alias("a"), "tb")
    b = tagged.select(F.col("vec_id").alias("b"), "tb")
    cands = (
        a.join(b, "tb")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("e"),
    )
    ea = base.select(F.col("vec_id").alias("a"), F.col("e").alias("va"))
    eb = base.select(F.col("vec_id").alias("b"), F.col("e").alias("vb"))
    return (
        cands.join(ea, "a")
        .join(eb, "b")
        .select(
            "a", "b", F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
        .orderBy(F.desc("cos"), "a", "b")
    )


def embedding_near_dup_pairs_sql(
    dim: int = 64,
    threshold: float = NEAR_DUP_THRESHOLD,
    bits: int = 8,
    tables: int = LSH_TABLES,
    quant: int = LSH_QUANT,
) -> str:
    """DuckDB oracle: identical planes, identical integer bucket bits,
    identical banded candidate join, identical rounded-cosine verify."""
    planes = lsh_planes(dim, tables * bits)
    bucket_exprs = []
    for t in range(tables):
        terms = [
            f"(CASE WHEN list_dot_product(q, {_plane_sql_array(planes[t * bits + j])})"
            f" > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(bits)
        ]
        bucket_exprs.append(f"({t << bits} + " + " + ".join(terms) + f") AS b{t}")
    bcols = ",\n         ".join(bucket_exprs)
    barr = "[" + ", ".join(f"b{t}" for t in range(tables)) + "]"
    return f"""
WITH base AS (
  SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
qe AS (
  SELECT vec_id, list_transform(e, x -> floor(x * {quant}.0)) AS q FROM base
),
bk AS (
  SELECT vec_id,
         {bcols}
  FROM qe
),
tv AS (
  SELECT vec_id, unnest({barr}) AS tb FROM bk
),
cands AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM tv x JOIN tv y USING (tb) WHERE x.vec_id < y.vec_id
),
scored AS (
  SELECT c.a, c.b,
         round(
           list_dot_product(p.e, v.e)
           / (sqrt(list_dot_product(p.e, p.e))
              * sqrt(list_dot_product(v.e, v.e))),
           6) AS cos
  FROM cands c
  JOIN base p ON c.a = p.vec_id
  JOIN base v ON c.b = v.vec_id
)
SELECT a, b, cos FROM scored WHERE cos >= {threshold}
ORDER BY cos DESC, a, b
"""


def _plane_sql_array(plane: np.ndarray) -> str:
    return "[" + ",".join(str(int(v)) + ".0" for v in plane) + "]"


def ann_lsh_topk_sql(
    dim: int = 64,
    probes=None,
    k: int = K,
    bits: int = 8,
    tables: int = LSH_TABLES,
    quant: int = LSH_QUANT,
) -> str:
    """DuckDB oracle reproducing :func:`ann_lsh_topk` *exactly* (same
    planes, same integer hashing, same Hamming-1 multiprobe, same
    rounded-cosine re-rank). Hyperplanes are inlined as literals — fine
    for an oracle; the Spark path broadcasts them."""
    probes = probes if probes is not None else PROBES
    planes = lsh_planes(dim, tables * bits)
    plist = ", ".join(str(p) for p in probes)
    bucket_exprs = []
    for t in range(tables):
        terms = [
            f"(CASE WHEN list_dot_product(q, {_plane_sql_array(planes[t * bits + j])})"
            f" > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(bits)
        ]
        bucket_exprs.append(f"({t << bits} + " + " + ".join(terms) + f") AS b{t}")
    bcols = ",\n         ".join(bucket_exprs)
    barr = "[" + ", ".join(f"b{t}" for t in range(tables)) + "]"
    mask = (1 << bits) - 1
    return f"""
WITH base AS (
  SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
qe AS (
  SELECT vec_id, list_transform(e, x -> floor(x * {quant}.0)) AS q FROM base
),
bk AS (
  SELECT vec_id,
         {bcols}
  FROM qe
),
tv AS (
  SELECT vec_id, unnest({barr}) AS tb FROM bk
),
pv AS (
  SELECT vec_id AS probe_id, tb FROM tv WHERE vec_id IN ({plist})
),
pnb AS (
  SELECT probe_id, tb FROM pv
  UNION
  SELECT probe_id,
         (tb - (tb % {mask + 1})) + xor(tb % {mask + 1}, 1 << j.j) AS tb
  FROM pv CROSS JOIN (SELECT unnest(range({bits})) AS j) j
),
cands AS (
  SELECT DISTINCT pnb.probe_id, tv.vec_id FROM pnb JOIN tv USING (tb)
),
scored AS (
  SELECT c.probe_id, c.vec_id,
         round(
           list_dot_product(p.e, v.e)
           / (sqrt(list_dot_product(p.e, p.e))
              * sqrt(list_dot_product(v.e, v.e))),
           6) AS cos
  FROM cands c
  JOIN base v ON c.vec_id = v.vec_id
  JOIN base p ON c.probe_id = p.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT probe_id, vec_id, cos FROM ranked WHERE rn <= {k}
ORDER BY probe_id, cos DESC, vec_id
"""


def embedding_components(
    emb: DataFrame,
    threshold: float = NEAR_DUP_THRESHOLD,
    bits: int | None = None,
    tables: int = LSH_TABLES,
    quant: int = LSH_QUANT,
    max_iters: int = 20,
) -> DataFrame:
    """Embedding near-duplicate *clusters*: connected components of
    the :func:`embedding_near_dup_pairs` graph (LSH-banded candidates,
    exact rounded-cosine verify), labeled by the minimum vec_id —
    the keep-one-per-cluster assignment for embedding-level dedup,
    symmetric with the text-side ``dedup.dedup_components``.

    Returns (vec_id, component_id) sorted by vec_id.
    """
    from .dedup import connected_components

    pairs = embedding_near_dup_pairs(
        emb, threshold=threshold, bits=bits, tables=tables, quant=quant
    ).select("a", "b")
    return connected_components(
        pairs, "a", "b", out_id="vec_id", max_iters=max_iters
    )


def embedding_components_sql(
    dim: int = 64,
    threshold: float = NEAR_DUP_THRESHOLD,
    bits: int = 8,
    tables: int = LSH_TABLES,
    quant: int = LSH_QUANT,
) -> str:
    """Recursive-CTE oracle over the exact pair query
    ``embedding_near_dup_pairs_sql`` hash-matches: component id = min
    vertex reachable in the symmetrized near-dup graph."""
    pairs_sql = embedding_near_dup_pairs_sql(
        dim=dim, threshold=threshold, bits=bits, tables=tables, quant=quant
    )
    return f"""
WITH RECURSIVE pr AS (
{pairs_sql}
),
edges AS (
  SELECT a AS src, b AS dst FROM pr
  UNION
  SELECT b, a FROM pr
),
walk(v, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.r
)
SELECT v::BIGINT AS vec_id, min(r)::BIGINT AS component_id
FROM walk GROUP BY v ORDER BY vec_id
"""


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    n_clusters: int = IVF_CLUSTERS,
    quant: int = LSH_QUANT,
    train_sample: int = 65536,
) -> dict:
    """Persist the IVF index: every vector assigned to its nearest
    centroid and written ``partitionBy(cid)`` — serving then reads
    only the probed clusters' *directories* (Parquet partition
    pruning), making the nprobe/n_clusters scan fraction real I/O,
    not just compute. The trained integer centroids are parameters
    and live in the meta file; a ``vectors`` artifact (sorted by
    vec_id) serves probe lookups with row-group pruning. Mirrors
    :func:`build_lsh_index`'s artifact design."""
    import json
    import os

    import pandas as pd

    spark = emb.sparkSession
    # input convention: float32 embeddings (array<float>), matching the
    # LSH artifact. The clusters artifact is written array<float>, so a
    # float64 source would be silently truncated and the
    # "result-identical to in-memory" guarantee of
    # ann_ivf_topk_indexed would not hold — refuse instead.
    from pyspark.sql.types import ArrayType, FloatType

    etype = emb.schema["embedding"].dataType
    if not (isinstance(etype, ArrayType) and isinstance(etype.elementType, FloatType)):
        raise ValueError(
            "build_ivf_index expects float32 embeddings (array<float>); "
            f"got {etype.simpleString()} — cast explicitly if truncation "
            "is acceptable"
        )
    n = emb.count()
    first = emb.select("embedding").first()
    if first is None:
        raise ValueError("build_ivf_index: input DataFrame has no rows")
    dim = len(first[0])
    # Arrow driver transfer (toPandas) — same rows, same float64
    # values, ~2x faster than pickled collect() at 64k samples
    train = emb.orderBy("vec_id").limit(train_sample).toPandas()
    tmat = np.array(train["embedding"].to_list(), dtype=np.float64)
    centroids = ivf_train(tmat, n_clusters, quant=quant)
    b_cent = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        cent = b_cent.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            out = pdf[["vec_id", "embedding"]].copy()
            out["cid"] = _ivf_assign(vecs, cent, quant)
            yield out

    src = spread_small_scan(emb, min_bytes=SPREAD_MIN_BYTES_LIGHT).select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    )
    (
        src.mapInPandas(assign, "vec_id bigint, embedding array<float>, cid bigint")
        .repartition("cid")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(index_dir, "clusters"))
    )
    (
        src.repartitionByRange(max(1, n // 65536 or 1), "vec_id")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, "vectors"))
    )
    meta = {
        "n_clusters": int(len(centroids)),
        "quant": quant,
        "dim": dim,
        "n": n,
        "centroids": [[int(x) for x in row] for row in centroids],
    }
    with open(os.path.join(index_dir, "ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ann_ivf_topk_indexed(
    spark,
    index_dir: str,
    probes=None,
    k: int = K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Serve IVF ANN from a persisted :func:`build_ivf_index`
    artifact: reads ONLY the probed clusters' directories (partition
    pruning on ``cid``), then the exact rounded-cosine re-rank.
    Result-identical to the in-memory :func:`ann_ivf_topk` with the
    same parameters and training rows (tested)."""
    import json
    import os

    probes = probes if probes is not None else PROBES
    with open(os.path.join(index_dir, "ivf_meta.json")) as f:
        meta = json.load(f)
    quant = meta["quant"]
    centroids = np.array(meta["centroids"], dtype=np.int64)

    pr = (
        spark.read.parquet(os.path.join(index_dir, "vectors"))
        .filter(F.col("vec_id").isin(probes))
        .collect()
    )
    if not pr:
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cos double"
        )
    pr = sorted(pr, key=lambda r: r.vec_id)
    pids = np.array([r.vec_id for r in pr], dtype=np.int64)
    pmat = np.array([r.embedding for r in pr], dtype=np.float64)
    plists = _ivf_probe_lists(pmat, centroids, quant, nprobe)
    rows = [(int(pid), int(cid)) for pid, cids in zip(pids, plists) for cid in cids]
    probe_df = spark.createDataFrame(rows, "probe_id bigint, cid bigint")
    wanted = sorted({cid for _, cid in rows})

    clusters = spark.read.parquet(os.path.join(index_dir, "clusters"))
    cands = (
        # .isin on the partition column -> directory-level pruning
        clusters.filter(F.col("cid").isin(wanted))
        .join(F.broadcast(probe_df), "cid")
        .select("probe_id", "vec_id", _as_double(F.col("embedding")).alias("e"))
    )
    pemb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(pids, pmat)],
        "probe_id bigint, pe array<double>",
    )
    scored = cands.join(F.broadcast(pemb), "probe_id").select(
        "probe_id",
        "vec_id",
        F.round(_cosine(F.col("pe"), F.col("e")), 6).alias("cos"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


# ------------------------------------------------------ product quant ----
#: PQ layout for the 64-dim embeddings table: 8 subspaces x 8 dims,
#: 32 codewords each -> a 5-byte code per vector (~100x compression
#: of a float64 vector), the faiss-style ADC scale path. Measured
#: recall@10 vs brute force on the synthetic gate embeddings (which
#: are near-random — PQ's hardest case): mean 0.89 / min 0.8 at
#: sf0.01 with the default pool.
PQ_M = 8
PQ_KS = 32
PQ_POOL = 100


def pq_train(
    vecs: np.ndarray,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 10,
    quant: int = LSH_QUANT,
) -> np.ndarray:
    """Deterministic product-quantization codebooks: the same
    integer k-means as :func:`ivf_train`, run independently per
    subspace -> (m, ks, dim/m) int64. Parameters, not data — train on
    a bounded sample."""
    dim = vecs.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    return np.stack(
        [
            ivf_train(vecs[:, s * sd : (s + 1) * sd], k=ks, iters=iters, quant=quant)
            for s in range(m)
        ]
    )


def _pq_encode(vecs: np.ndarray, books: np.ndarray, quant: int) -> np.ndarray:
    """(n, dim) float64 -> (n, m) int64 codeword ids, integer-exact
    (floor-quantized squared L2, first-min tie rule per subspace)."""
    m, ks, sd = books.shape
    q = np.floor(vecs.astype(np.float64) * float(quant)).astype(np.int64)
    return np.stack(
        [
            _sq_dists(q[:, s * sd : (s + 1) * sd], books[s]).argmin(axis=1)
            for s in range(m)
        ],
        axis=1,
    ).astype(np.int64)


def pq_adc_candidates(
    emb: DataFrame,
    books: np.ndarray,
    luts: np.ndarray,
    pids: np.ndarray,
    pool: int = PQ_POOL,
    quant: int = LSH_QUANT,
) -> DataFrame:
    """ONE Arrow-batched corpus pass: encode each vector against the
    broadcast codebooks and accumulate its asymmetric distance to
    every probe through the probe's (m, ks) LUT. Each batch emits only
    its batch-local top-``pool`` per probe by (adc, vec_id) — the
    global window's exact total order, so the cut is provably lossless
    for the downstream per-probe top-``pool`` — bounding the shuffle
    at O(batches·P·pool) rows regardless of corpus size."""
    import pandas as pd

    spark = emb.sparkSession
    b = spark.sparkContext.broadcast((books, luts, pids))

    def adc_scan(batches):
        books_, luts_, pids_ = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            codes = _pq_encode(vecs, books_, quant)  # (n, m)
            n = len(codes)
            # adc[p, v] = sum_s luts[p, s, codes[v, s]]
            sub = np.arange(books_.shape[0])[None, :]
            per = luts_[:, sub, codes[:, None, :]]  # (P, n, 1, m) fancy
            adc = per.reshape(len(pids_), n, -1).sum(axis=2)
            vid = pdf["vec_id"].to_numpy(np.int64)
            pp = min(pool, n)
            out = []
            for qi in range(len(pids_)):
                row = adc[qi]
                # batch-local top-pool, ties by vec_id asc — the
                # global window's exact order, so the cut is lossless
                order = np.lexsort((vid, row))[:pp]
                out.append(
                    pd.DataFrame(
                        {
                            "probe_id": pids_[qi],
                            "vec_id": vid[order],
                            "adc": row[order],
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    ).mapInPandas(adc_scan, "probe_id bigint, vec_id bigint, adc bigint")


def ann_pq_topk(
    emb: DataFrame,
    probes=None,
    k: int = K,
    m: int = PQ_M,
    ks: int = PQ_KS,
    pool: int = PQ_POOL,
    quant: int = LSH_QUANT,
    train_sample: int = 65536,
) -> DataFrame:
    """Product-quantization ANN (faiss-flavored ADC): train per-
    subspace codebooks on a bounded sample, then ONE Arrow-batched
    corpus pass encodes each vector and accumulates its asymmetric
    distance to every probe through the probe's (m, ks) lookup table
    — integer-exact, so the SQL oracle reproduces the candidate pool
    bit-for-bit. Per-probe top-``pool`` candidates by (ADC, vec_id)
    are exact-cosine re-ranked to ``k`` (same output convention as
    the LSH/IVF paths).

    100-TB shape: the scan emits (probe, vec, adc) map-side from an
    8-byte code per vector — at scale the codes would be a persisted
    artifact like :func:`build_ivf_index`'s and the LUT add replaces
    any float read of the corpus; each Arrow batch keeps only its
    batch-local top-``pool`` per probe (total order (adc, vec_id),
    identical to the global window's, so no global survivor can be
    cut early — the same lossless argument as
    :func:`ann_cosine_topk_kernel`'s partition-local cut), and the
    only shuffle is the per-probe top-``pool`` window over
    O(batches·P·pool) rows instead of n·P."""
    import pandas as pd

    probes = probes if probes is not None else PROBES
    spark = emb.sparkSession

    # Arrow driver transfer (toPandas) — same rows, same float64
    # values, ~2x faster than pickled collect() at 64k samples
    train = emb.orderBy("vec_id").limit(train_sample).toPandas()
    tmat = np.array(train["embedding"].to_list(), dtype=np.float64)
    books = pq_train(tmat, m=m, ks=ks, quant=quant)
    sd = books.shape[2]

    pr = sorted(
        emb.filter(F.col("vec_id").isin(probes)).collect(),
        key=lambda r: r.vec_id,
    )
    if not pr:
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cos double"
        )
    pids = np.array([int(r.vec_id) for r in pr], dtype=np.int64)
    pmat = np.array([r.embedding for r in pr], dtype=np.float64)
    pq_ = np.floor(pmat * float(quant)).astype(np.int64)
    # (P, m, ks) ADC lookup tables: dist from probe subvector to codeword
    luts = np.stack(
        [_sq_dists(pq_[:, s * sd : (s + 1) * sd], books[s]) for s in range(m)],
        axis=1,
    )
    adcs = pq_adc_candidates(
        spread_small_scan(emb, min_bytes=SPREAD_MIN_BYTES_LIGHT),
        books, luts, pids, pool=pool, quant=quant,
    )
    wpool = Window.partitionBy("probe_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    cands = (
        adcs.withColumn("rn", F.row_number().over(wpool))
        .filter(F.col("rn") <= pool)
        .select("probe_id", "vec_id")
    )
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("e"),
    )
    pemb = base.filter(F.col("vec_id").isin([int(p) for p in pids])).select(
        F.col("vec_id").alias("probe_id"), F.col("e").alias("pe")
    )
    scored = (
        F.broadcast(cands)
        .join(base, "vec_id")
        .join(F.broadcast(pemb), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(_cosine(F.col("pe"), F.col("e")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


def ann_pq_topk_sql(
    books: np.ndarray,
    probes=None,
    k: int = K,
    pool: int = PQ_POOL,
    quant: int = LSH_QUANT,
) -> str:
    """DuckDB oracle for :func:`ann_pq_topk`: trained codebooks as
    literals; per-subspace first-min encoding, probe LUTs, integer ADC
    sums, (adc, vec_id) pool cut and cosine re-rank replicate the
    Spark pipeline exactly."""
    probes = probes if probes is not None else PROBES
    plist = ", ".join(str(p) for p in probes)
    m, ks, sd = books.shape
    # cb(s, code, c): one row per codeword, c = float list literal
    cb_rows = ", ".join(
        f"({s}, {j}, [" + ",".join(f"{int(v)}.0" for v in books[s][j]) + "])"
        for s in range(m)
        for j in range(ks)
    )
    return f"""
WITH base AS (
  SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
qe AS (
  SELECT vec_id, list_transform(e, x -> floor(x * {quant}.0)) AS q FROM base
),
cb(s, code, c) AS (SELECT * FROM (VALUES {cb_rows})),
subs AS (
  SELECT vec_id, s.s AS s, q[s.s * {sd} + 1 : s.s * {sd} + {sd}] AS sq
  FROM qe CROSS JOIN (SELECT unnest(range({m})) AS s) s
),
dists AS (
  SELECT subs.vec_id, subs.s, cb.code,
         (list_dot_product(sq, sq) - 2 * list_dot_product(sq, c)
          + list_dot_product(c, c))::BIGINT AS d
  FROM subs JOIN cb ON subs.s = cb.s
),
codes AS (
  SELECT vec_id, s, code, d,
         row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rnk
  FROM dists
),
vcodes AS (SELECT vec_id, s, code FROM codes WHERE rnk = 1),
plut AS (
  SELECT vec_id AS probe_id, s, code, d FROM dists
  WHERE vec_id IN ({plist})
),
adc AS (
  SELECT plut.probe_id, vcodes.vec_id, sum(plut.d)::BIGINT AS adc
  FROM vcodes JOIN plut USING (s, code)
  GROUP BY 1, 2
),
pooled AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY adc, vec_id) AS rn
  FROM adc
),
cands AS (SELECT probe_id, vec_id FROM pooled WHERE rn <= {pool}),
scored AS (
  SELECT cnd.probe_id, cnd.vec_id,
         round(
           list_dot_product(p.e, v.e)
           / (sqrt(list_dot_product(p.e, p.e))
              * sqrt(list_dot_product(v.e, v.e))),
           6) AS cos
  FROM cands cnd
  JOIN base v ON cnd.vec_id = v.vec_id
  JOIN base p ON cnd.probe_id = p.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT probe_id, vec_id, cos FROM ranked WHERE rn <= {k}
ORDER BY probe_id, cos DESC, vec_id
"""


# ---------------------------------------------------------------- IVF-PQ


def ivfpq_train(
    tmat: np.ndarray,
    n_clusters: int = IVF_CLUSTERS,
    m: int = PQ_M,
    ks: int = PQ_KS,
    quant: int = LSH_QUANT,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the two-level faiss-IVFPQ structure on a bounded sample:
    coarse integer k-means centroids, then PQ codebooks on the integer
    RESIDUALS (vector minus its assigned centroid, all in the
    floor(x*quant) domain, so the inner ``pq_train`` runs with
    quant=1 and stays bit-exact). Both are parameters, not data."""
    centroids = ivf_train(tmat, k=n_clusters, quant=quant)
    tq = np.floor(tmat.astype(np.float64) * float(quant)).astype(np.int64)
    a = _sq_dists(tq, centroids).argmin(axis=1)
    resid = (tq - centroids[a]).astype(np.float64)
    books = pq_train(resid, m=m, ks=ks, quant=1)
    return centroids, books


def ivfpq_probe_luts(
    pmat: np.ndarray,
    centroids: np.ndarray,
    books: np.ndarray,
    probe_lists: list[list[int]],
    quant: int = LSH_QUANT,
) -> np.ndarray:
    """(P, nprobe, m, ks) residual ADC lookup tables: the probe's
    integer residual vs each probed centroid, per-subspace squared L2
    to every codeword. One implementation for serving AND tests."""
    m, ks, sd = books.shape
    pq_ = np.floor(pmat.astype(np.float64) * float(quant)).astype(np.int64)
    nprobe = len(probe_lists[0]) if probe_lists else 0
    luts = np.zeros((len(probe_lists), nprobe, m, ks), dtype=np.int64)
    for qi, cids in enumerate(probe_lists):
        for j, cid in enumerate(cids):
            prr = (pq_[qi] - centroids[cid])[None, :]
            for s in range(m):
                luts[qi, j, s] = _sq_dists(
                    prr[:, s * sd : (s + 1) * sd], books[s]
                )[0]
    return luts


def ivfpq_adc_candidates(
    emb: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    luts: np.ndarray,
    probe_lists: list[list[int]],
    pids: np.ndarray,
    pool: int = PQ_POOL,
    quant: int = LSH_QUANT,
) -> DataFrame:
    """ONE Arrow-batched corpus pass: assign each vector to its coarse
    centroid (first-min), PQ-encode its residual, and accumulate ADC
    only against probes that actually probe that centroid's list —
    the inverted-list pruning is what makes IVFPQ beat flat PQ at
    scale (a vector outside every probed list costs one assignment
    and nothing else). Each batch emits its batch-local top-``pool``
    per probe by (adc, vec_id) — the global window's exact total
    order, so the cut is lossless (same argument as
    :func:`pq_adc_candidates`)."""
    import pandas as pd

    spark = emb.sparkSession
    b = spark.sparkContext.broadcast(
        (centroids, books, luts, probe_lists, pids)
    )

    def scan(batches):
        cents, books_, luts_, plists_, pids_ = b.value
        m = books_.shape[0]
        probed_cids = sorted({c for pl in plists_ for c in pl})
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.array(pdf["embedding"].to_list(), dtype=np.float64)
            q = np.floor(vecs * float(quant)).astype(np.int64)
            a = _sq_dists(q, cents).argmin(axis=1)
            resid = q - cents[a]
            # residuals live in the already-quantized integer domain,
            # so the shared encoder runs with quant=1 (floor is exact)
            codes = _pq_encode(resid.astype(np.float64), books_, 1)
            vid = pdf["vec_id"].to_numpy(np.int64)
            # gather each probed list ONCE per batch (probes share
            # coarse lists, so per-(probe, cid) masking would redo
            # the boolean scans and copies 2-3x)
            by_cid = {}
            for cid in probed_cids:
                mask = a == cid
                if mask.any():
                    by_cid[cid] = (codes[mask], vid[mask])
            out = []
            srange = np.arange(m)
            for qi in range(len(pids_)):
                # vectors whose coarse list this probe probes
                sel_adc = []
                sel_vid = []
                for j, cid in enumerate(plists_[qi]):
                    hit = by_cid.get(cid)
                    if hit is None:
                        continue
                    cc, vv = hit
                    sel_adc.append(
                        luts_[qi, j][srange, cc].sum(axis=1)
                    )
                    sel_vid.append(vv)
                if not sel_adc:
                    continue
                adc = np.concatenate(sel_adc)
                vv = np.concatenate(sel_vid)
                pp = min(pool, len(adc))
                order = np.lexsort((vv, adc))[:pp]
                out.append(
                    pd.DataFrame(
                        {
                            "probe_id": pids_[qi],
                            "vec_id": vv[order],
                            "adc": adc[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return spread_small_scan(emb, min_bytes=SPREAD_MIN_BYTES_LIGHT).select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    ).mapInPandas(scan, "probe_id bigint, vec_id bigint, adc bigint")


def ann_ivfpq_topk(
    emb: DataFrame,
    probes=None,
    k: int = K,
    n_clusters: int = IVF_CLUSTERS,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    ks: int = PQ_KS,
    pool: int = PQ_POOL,
    quant: int = LSH_QUANT,
    train_sample: int = 65536,
) -> DataFrame:
    """faiss-style IVFPQ, the structure billion-scale ANN actually
    serves: coarse inverted lists prune the corpus to ``nprobe``
    lists per probe, PQ codes over centroid RESIDUALS compress each
    kept vector to ``m`` bytes, an ADC LUT scan ranks candidates
    without touching floats, and the per-probe top-``pool`` is
    exact-cosine re-ranked to ``k``. Every stage is integer-exact
    (floor-quantized squared L2, first-min ties), so the DuckDB
    oracle reproduces the candidate pool bit-for-bit.

    100-TB shape: at scale the assignment + codes become a persisted
    artifact partitioned by coarse cid (``build_ivf_index``'s layout
    with an extra m-byte code column) and the scan reads ONLY the
    probed partitions; here the one-pass form assigns on the fly but
    keeps the same pruning — a vector outside every probed list
    contributes one matmul row and zero shuffle bytes. The shuffle is
    the batch-local-cut candidate stream, O(batches·P·pool)."""
    probes = probes if probes is not None else PROBES
    spark = emb.sparkSession

    # Arrow driver transfer (toPandas) — same rows, same float64
    # values, ~2x faster than pickled collect() at 64k samples
    train = emb.orderBy("vec_id").limit(train_sample).toPandas()
    tmat = np.array(train["embedding"].to_list(), dtype=np.float64)
    centroids, books = ivfpq_train(
        tmat, n_clusters=n_clusters, m=m, ks=ks, quant=quant
    )

    pr = sorted(
        emb.filter(F.col("vec_id").isin(probes)).collect(),
        key=lambda r: r.vec_id,
    )
    if not pr:
        return spark.createDataFrame(
            [], "probe_id bigint, vec_id bigint, cos double"
        )
    pids = np.array([int(r.vec_id) for r in pr], dtype=np.int64)
    pmat = np.array([r.embedding for r in pr], dtype=np.float64)
    probe_lists = _ivf_probe_lists(pmat, centroids, quant, nprobe)
    luts = ivfpq_probe_luts(pmat, centroids, books, probe_lists, quant)
    adcs = ivfpq_adc_candidates(
        emb, centroids, books, luts, probe_lists, pids,
        pool=pool, quant=quant,
    )
    wpool = Window.partitionBy("probe_id").orderBy(
        F.asc("adc"), F.asc("vec_id")
    )
    cands = (
        adcs.withColumn("rn", F.row_number().over(wpool))
        .filter(F.col("rn") <= pool)
        .select("probe_id", "vec_id")
    )
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("e"),
    )
    pemb = base.filter(
        F.col("vec_id").isin([int(p) for p in pids])
    ).select(F.col("vec_id").alias("probe_id"), F.col("e").alias("pe"))
    scored = (
        F.broadcast(cands)
        .join(base, "vec_id")
        .join(F.broadcast(pemb), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            F.round(_cosine(F.col("pe"), F.col("e")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


def ann_ivfpq_topk_sql(
    centroids: np.ndarray,
    books: np.ndarray,
    probes=None,
    k: int = K,
    nprobe: int = IVF_NPROBE,
    pool: int = PQ_POOL,
    quant: int = LSH_QUANT,
) -> str:
    """DuckDB oracle for :func:`ann_ivfpq_topk`: trained centroids and
    residual codebooks as literals; coarse assignment, probe lists,
    residual encoding (first-min), per-(probe, cid) residual LUTs,
    ADC sums restricted to probed lists, (adc, vec_id) pool cut and
    cosine re-rank replicate the Spark pipeline exactly."""
    probes = probes if probes is not None else PROBES
    plist = ", ".join(str(p) for p in probes)
    nk = len(centroids)
    dim = centroids.shape[1]
    m, ks, sd = books.shape
    cent_lits = ", ".join(
        "[" + ",".join(str(int(v)) + ".0" for v in c) + "]" for c in centroids
    )
    dists = ", ".join(
        f"list_dot_product(q, q) - 2*list_dot_product(q, c[{j + 1}])"
        f" + list_dot_product(c[{j + 1}], c[{j + 1}])"
        for j in range(nk)
    )
    cb_rows = ", ".join(
        f"({s}, {j}, [" + ",".join(f"{int(v)}.0" for v in books[s][j]) + "])"
        for s in range(m)
        for j in range(ks)
    )
    return f"""
WITH base AS (
  SELECT vec_id::BIGINT AS vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
cent(c) AS (SELECT [{cent_lits}]),
cb(s, code, cw) AS (SELECT * FROM (VALUES {cb_rows})),
qe AS (
  SELECT vec_id, list_transform(e, x -> floor(x * {quant}.0)) AS q FROM base
),
dv AS (
  SELECT vec_id, q, [{dists}] AS d FROM qe CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, q, list_position(d, list_min(d)) - 1 AS cid FROM dv
),
-- integer residual vs the assigned centroid
resid AS (
  SELECT vec_id, cid,
         list_transform(range(1, {dim + 1}),
                        i -> (q[i::INT] - c[cid::INT + 1][i::INT])::DOUBLE)
           AS r
  FROM assigned CROSS JOIN cent
),
subs AS (
  SELECT vec_id, cid, s.s AS s,
         r[s.s * {sd} + 1 : s.s * {sd} + {sd}] AS rs
  FROM resid CROSS JOIN (SELECT unnest(range({m})) AS s) s
),
rdists AS (
  SELECT subs.vec_id, subs.cid, subs.s, cb.code,
         (list_dot_product(rs, rs) - 2 * list_dot_product(rs, cw)
          + list_dot_product(cw, cw))::BIGINT AS d
  FROM subs JOIN cb ON subs.s = cb.s
),
vcodes AS (
  SELECT vec_id, cid, s, code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, s ORDER BY d, code) AS rnk
    FROM rdists
  ) WHERE rnk = 1
),
pc AS (
  SELECT vec_id AS probe_id, j.j AS cid,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY list_extract(d, j.j + 1), j.j
         ) AS rnk
  FROM dv CROSS JOIN (SELECT unnest(range({nk})) AS j) j
  WHERE vec_id IN ({plist})
),
probe_cids AS (SELECT probe_id, cid FROM pc WHERE rnk <= {nprobe}),
-- probe residual vs each PROBED centroid, then its LUT
presid AS (
  SELECT pcs.probe_id, pcs.cid,
         list_transform(range(1, {dim + 1}),
                        i -> (q[i::INT] - c[pcs.cid::INT + 1][i::INT])::DOUBLE)
           AS r
  FROM probe_cids pcs
  JOIN qe ON qe.vec_id = pcs.probe_id
  CROSS JOIN cent
),
psubs AS (
  SELECT probe_id, cid, s.s AS s,
         r[s.s * {sd} + 1 : s.s * {sd} + {sd}] AS rs
  FROM presid CROSS JOIN (SELECT unnest(range({m})) AS s) s
),
plut AS (
  SELECT psubs.probe_id, psubs.cid, psubs.s, cb.code,
         (list_dot_product(rs, rs) - 2 * list_dot_product(rs, cw)
          + list_dot_product(cw, cw))::BIGINT AS d
  FROM psubs JOIN cb ON psubs.s = cb.s
),
adc AS (
  SELECT plut.probe_id, vcodes.vec_id, sum(plut.d)::BIGINT AS adc
  FROM vcodes
  JOIN plut ON plut.cid = vcodes.cid
           AND plut.s = vcodes.s AND plut.code = vcodes.code
  GROUP BY 1, 2
),
pooled AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY adc, vec_id) AS rn
  FROM adc
),
cands AS (SELECT probe_id, vec_id FROM pooled WHERE rn <= {pool}),
scored AS (
  SELECT cnd.probe_id, cnd.vec_id,
         round(
           list_dot_product(p.e, v.e)
           / (sqrt(list_dot_product(p.e, p.e))
              * sqrt(list_dot_product(v.e, v.e))),
           6) AS cos
  FROM cands cnd
  JOIN base v ON cnd.vec_id = v.vec_id
  JOIN base p ON cnd.probe_id = p.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT probe_id, vec_id, cos FROM ranked WHERE rn <= {k}
ORDER BY probe_id, cos DESC, vec_id
"""


def ann_recall_report(emb: DataFrame, probes=None, k: int = K) -> DataFrame:
    """QA utility: recall@k of every approximate ANN path vs the
    exact scan, per probe — the report a user runs before choosing a
    serving structure (LSH vs IVF vs PQ vs IVFPQ trade recall against
    scan shape differently on different data). Returns (method,
    probe_id, recall) sorted by (method, probe_id); each method's
    column is len(top-k ∩ exact-top-k) / len(exact-top-k) — the
    denominator is the exact result size, which equals k except on a
    corpus smaller than k.

    Driver-side set math on P·k rows per method — bounded, like every
    probe-shaped collect in this module."""
    probes = probes if probes is not None else PROBES
    spark = emb.sparkSession
    methods = {
        "lsh": lambda: ann_lsh_topk(emb, probes=probes, k=k,
                                    bits=8, tables=4, multiprobe=1),
        "ivf": lambda: ann_ivf_topk(emb, probes=probes, k=k),
        "pq": lambda: ann_pq_topk(emb, probes=probes, k=k),
        "ivfpq": lambda: ann_ivfpq_topk(emb, probes=probes, k=k),
    }
    exact = {}
    for r in ann_cosine_topk(emb, probes=probes, k=k).collect():
        exact.setdefault(int(r.probe_id), set()).add(int(r.vec_id))
    rows = []
    for name in sorted(methods):
        got: dict[int, set] = {}
        for r in methods[name]().collect():
            got.setdefault(int(r.probe_id), set()).add(int(r.vec_id))
        for p, want in sorted(exact.items()):
            rec = len(want & got.get(p, set())) / len(want)
            rows.append((name, p, round(rec, 4)))
    return spark.createDataFrame(
        rows, "method string, probe_id bigint, recall double"
    ).orderBy("method", "probe_id")
