"""Similarity search over the embeddings table.

- :func:`ann_cosine_topk` — brute-force cosine top-k for a probe set,
  all in built-in expressions (zip_with dot product in whole-stage
  codegen). The exactness baseline; at scale the probe set broadcasts
  and the scan is embarrassingly parallel.
- :func:`ann_lsh_topk` — the scale path: sign-random-projection LSH.
  Hyperplanes are derived deterministically from md5 so executors and
  the oracle-free test can re-derive them; candidates come from the
  probe's bucket (multi-probe over Hamming-1 neighbors), re-ranked by
  exact cosine. Approximate -> rows-only correctness check by the
  driver; the pytest suite checks recall against the brute force.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PROBES = list(range(10))
K = 10
# 4 hyperplanes -> 16 buckets; with Hamming-1 multiprobe a query scans
# ~5/16 of the corpus. Recall on *clustered* data is far higher than
# the scanned fraction; on isotropic random vectors (the synthetic
# table) it approaches it — the pytest recall bound reflects that
# worst case.
LSH_BITS = 4


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    return dot / (na * nb)


def ann_cosine_topk(emb: DataFrame, probes=None, k: int = K) -> DataFrame:
    probes = probes if probes is not None else PROBES
    p = (
        emb.filter(F.col("vec_id").isin(probes))
        .select(
            F.col("vec_id").alias("probe_id"),
            _as_double(F.col("embedding")).alias("pe"),
        )
    )
    pairs = F.broadcast(p).crossJoin(
        emb.select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            _as_double(F.col("embedding")).alias("e"),
        )
    )
    scored = pairs.select(
        F.col("probe_id").cast("bigint").alias("probe_id"),
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

    partial = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"), "embedding"
    ).mapInPandas(score, "probe_id bigint, vec_id bigint, cos double")
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )


def lsh_hyperplanes(dim: int, bits: int = LSH_BITS, seed: str = "bm25spark-lsh"):
    """Deterministic pseudo-random hyperplanes: md5-counter stream ->
    uniform floats -> standard-normal-ish via sum of 4 uniforms."""
    need = bits * dim * 4
    vals = np.empty(need, dtype=np.float64)
    i = 0
    ctr = 0
    while i < need:
        h = hashlib.md5(f"{seed}:{ctr}".encode()).digest()
        for off in range(0, 16, 4):
            if i >= need:
                break
            u = int.from_bytes(h[off : off + 4], "big") / 2**32
            vals[i] = u
            i += 1
        ctr += 1
    planes = vals.reshape(bits, dim, 4).sum(axis=2) - 2.0  # ~N(0, 1/3*4)
    return planes


def ann_lsh_topk(
    emb: DataFrame, probes=None, k: int = K, bits: int = LSH_BITS
) -> DataFrame:
    """Bucketed ANN: bucket = sign bits of hyperplane projections;
    candidates = vectors in the probe's bucket or any Hamming-1
    neighbor bucket; exact cosine re-rank inside the candidate set."""
    probes = probes if probes is not None else PROBES
    dim = len(emb.select("embedding").first()[0])
    planes = lsh_hyperplanes(dim, bits)
    plane_cols = [F.array(*[F.lit(float(v)) for v in planes[j]]) for j in range(bits)]

    def bucket_col(e):
        bit_terms = []
        for j in range(bits):
            dot = F.aggregate(
                F.zip_with(e, plane_cols[j], lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit_terms.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
        return sum(bit_terms[1:], bit_terms[0])

    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        _as_double(F.col("embedding")).alias("e"),
    ).withColumn("bucket", bucket_col(F.col("e")))

    p = base.filter(F.col("vec_id").isin(probes)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.col("bucket").alias("pbucket"),
    )
    # multi-probe: own bucket + every Hamming-1 neighbor
    neighbor_buckets = F.array(
        F.col("pbucket"),
        *[
            F.col("pbucket").bitwiseXOR(F.lit(1 << j)).cast("bigint")
            for j in range(bits)
        ],
    )
    p = p.withColumn("cand_bucket", F.explode(neighbor_buckets))
    cands = F.broadcast(p).join(
        base, F.col("bucket") == F.col("cand_bucket"), "inner"
    )
    scored = cands.select(
        F.col("probe_id"),
        F.col("vec_id"),
        F.round(_cosine(F.col("pe"), F.col("e")), 6).alias("cos"),
    ).dropDuplicates(["probe_id", "vec_id"])
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("probe_id", "vec_id", "cos")
        .orderBy("probe_id", F.desc("cos"), "vec_id")
    )
