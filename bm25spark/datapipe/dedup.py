"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. All hash math uses md5 (identical in Spark and DuckDB) so
each Spark pipeline has an exact SQL oracle; every pipeline is
pure-JVM expressions (no Python UDFs).

Scale notes: exact dedup is one hash-shuffle groupBy. MinHash/SimHash
signatures are narrow per-row transforms (shingle arrays stay inside
one row until the signature explode), so they scale linearly; the LSH
band self-join is the standard banding trick — join fan-out is bounded
by bucket size, and Spark's AQE skew-join splits pathological buckets.
The all-pairs n-gram Jaccard join is intentionally bounded to
word-3-gram shingles (rare collisions) and exists as the exact
verifier for the MinHash estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 4  # 2 rows per band
SHINGLE_WORDS = 3
SIMHASH_BITS = 16


# ---------------------------------------------------------------- exact ----

def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: every content group with its size and
    keeper (minimum doc_id). One shuffle."""
    return (
        docs.filter(F.col("text").isNotNull())
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("keeper_id"),
        )
        .orderBy("content_hash")
    )


def exact_dup_groups_sql() -> str:
    return """
SELECT md5(text) AS content_hash,
       count(*)::BIGINT AS n_dups,
       min(doc_id)::BIGINT AS keeper_id
FROM documents WHERE text IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


# -------------------------------------------------------------- shingles ----

def _shingles_col():
    """Distinct word-3-gram shingles of the simple-analyzer tokens,
    computed with built-in array expressions (stays in codegen)."""
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda s: s != "")
    n = F.size(toks)
    shingles = F.when(
        n >= SHINGLE_WORDS,
        F.transform(
            F.sequence(F.lit(1), n - (SHINGLE_WORDS - 1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(shingles)


_SHINGLES_SQL = f"""
shing AS (
  SELECT doc_id, unnest(list_distinct([
      tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]
      FOR i IN range(1, len(tok) - {SHINGLE_WORDS - 2})
  ])) AS shingle
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '') AS tok
    FROM documents WHERE text IS NOT NULL
  ) WHERE len(tok) >= {SHINGLE_WORDS}
)"""


# --------------------------------------------------------------- minhash ----

def minhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-doc MinHash signature: sig_j = min over shingles of
    md5(j || ':' || shingle), j in 0..7. Docs with no shingles get no
    row (matching the SQL oracle)."""
    ex = (
        docs.filter(F.col("text").isNotNull())
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.explode(_shingles_col()).alias("shingle"))
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"sig{j}")
        for j in range(N_HASHES)
    ]
    return ex.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


def minhash_signatures_sql() -> str:
    aggs = ",\n       ".join(
        f"min(md5('{j}:' || shingle)) AS sig{j}" for j in range(N_HASHES)
    )
    return f"""
WITH {_SHINGLES_SQL}
SELECT doc_id::BIGINT AS doc_id,
       {aggs}
FROM shing GROUP BY doc_id ORDER BY doc_id
"""


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """LSH banding: band b = md5(sig_{2b} || sig_{2b+1}); docs sharing
    any band become a candidate pair, scored by the fraction of
    matching signature components (the MinHash Jaccard estimate)."""
    sig = minhash_signatures(docs)
    bands = sig.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("|", f"sig{2*b}", f"sig{2*b+1}")).alias(f"band{b}")
            for b in range(N_BANDS)
        ],
        *[F.col(f"sig{j}") for j in range(N_HASHES)],
    )
    stacked = bands.select(
        "doc_id",
        F.explode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias(
            "band_hash"
        ),
    )
    pairs = (
        stacked.alias("a")
        .join(stacked.alias("b"), "band_hash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    *[F.col(f"sig{j}").alias(f"a{j}") for j in range(N_HASHES)])
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    *[F.col(f"sig{j}").alias(f"b{j}") for j in range(N_HASHES)])
    est = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
        for j in range(N_HASHES)
    ) / float(N_HASHES)
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", F.round(est, 4).alias("est_jaccard")
        )
        .orderBy("doc_a", "doc_b")
    )


def minhash_candidate_pairs_sql() -> str:
    band_exprs = ",\n         ".join(
        f"md5(sig{2*b} || '|' || sig{2*b+1}) AS band{b}" for b in range(N_BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(N_BANDS))
    est = " + ".join(
        f"(CASE WHEN a.sig{j} = b.sig{j} THEN 1 ELSE 0 END)"
        for j in range(N_HASHES)
    )
    sig_aggs = ",\n       ".join(
        f"min(md5('{j}:' || shingle)) AS sig{j}" for j in range(N_HASHES)
    )
    return f"""
WITH {_SHINGLES_SQL},
sig AS (
  SELECT doc_id::BIGINT AS doc_id, {sig_aggs}
  FROM shing GROUP BY doc_id
),
bands AS (
  SELECT doc_id, {band_exprs} FROM sig
),
stacked AS (
  SELECT doc_id, unnest([{band_list}]) AS band_hash FROM bands
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM stacked a JOIN stacked b USING (band_hash)
  WHERE a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(({est}) / {float(N_HASHES)}, 4) AS est_jaccard
FROM pairs p
JOIN sig a ON a.doc_id = p.doc_a
JOIN sig b ON b.doc_id = p.doc_b
ORDER BY p.doc_a, p.doc_b
"""


# --------------------------------------------------------------- simhash ----

def _nibble_high_bit_spark(j: int):
    # high bit of hex nibble j of md5(shingle): 1 for chars 89abcdef
    c = F.substring(F.md5(F.col("shingle")), j + 1, 1)
    return F.when(c.isin(*"89abcdef"), 1).otherwise(-1)


def simhash(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over distinct word shingles: bit j = sign of the
    sum over shingles of (+1/-1 by the high bit of md5 nibble j)."""
    ex = (
        docs.filter(F.col("text").isNotNull())
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.explode(_shingles_col()).alias("shingle"))
    )
    sums = ex.groupBy("doc_id").agg(
        *[F.sum(_nibble_high_bit_spark(j)).alias(f"s{j}") for j in range(SIMHASH_BITS)]
    )
    fp = sum(
        F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0)
        for j in range(SIMHASH_BITS)
    )
    return sums.select(
        "doc_id", fp.cast("bigint").alias("simhash")
    ).orderBy("doc_id")


def simhash_sql() -> str:
    sums = ",\n       ".join(
        f"sum(CASE WHEN substr(md5(shingle), {j + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH {_SHINGLES_SQL},
sums AS (
  SELECT doc_id::BIGINT AS doc_id, {sums}
  FROM shing GROUP BY doc_id
)
SELECT doc_id, ({fp})::BIGINT AS simhash FROM sums ORDER BY doc_id
"""


# -------------------------------------------------------- n-gram jaccard ----

def ngram_jaccard_pairs(docs: DataFrame, limit: int = 20) -> DataFrame:
    """Exact Jaccard over distinct word-3-gram shingle sets for all
    pairs sharing at least one shingle; top pairs. The exact verifier
    for the MinHash estimate."""
    ex = (
        docs.filter(F.col("text").isNotNull())
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                F.explode(_shingles_col()).alias("shingle"))
    )
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n_sh").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(limit)
    )


def ngram_jaccard_pairs_sql(limit: int = 20) -> str:
    return f"""
WITH {_SHINGLES_SQL},
sizes AS (SELECT doc_id::BIGINT AS doc_id, count(*) AS n_sh FROM shing GROUP BY 1),
inter AS (
  SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(i.inter / (sa.n_sh + sb.n_sh - i.inter), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
ORDER BY jaccard DESC, i.doc_a, i.doc_b
LIMIT {limit}
"""
