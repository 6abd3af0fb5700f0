"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. All hash math uses md5 (identical in Spark, Python hashlib,
and DuckDB) so each Spark pipeline has an exact SQL oracle.

Scale notes: exact dedup is one hash-shuffle groupBy. MinHash
signatures are ONE narrow Arrow-batched pass (tokenize -> shingle ->
md5 -> per-slice min entirely inside the batch, nothing shuffles
until the band self-join) — the r7 optimization round moved them off
per-shingle JVM md5 expressions, whose commons-codec digest costs
~20x Python's hashlib and forced an extra explode + groupBy shuffle;
the SQL oracle pins that the rewrite is value-identical. SimHash
signatures remain narrow per-row JVM transforms. The LSH band
self-join is the standard banding trick — join fan-out is bounded by
bucket size, and Spark's AQE skew-join splits pathological buckets.
The all-pairs n-gram Jaccard join is intentionally bounded to
word-3-gram shingles (rare collisions) and exists as the exact
verifier for the MinHash estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .util import spread_small_scan

N_HASHES = 8
N_BANDS = 4  # 2 rows per band
SHINGLE_WORDS = 3
SIMHASH_BITS = 16

# Eight genuinely independent 32-bit hashes per shingle: slice the
# 128-bit md5(shingle) into four 8-hex windows, and md5(shingle||'#')
# into four more. (The earlier affine construction
# (A_j*h + B_j) mod (2^61-1) was silently degenerate: with h < 2^32
# and small A_j the product never wraps the modulus, so every
# "independent" component was a monotone function of the SAME base
# hash — all eight minima landed on one shingle, collapsing the
# signature to a single-hash equality test. Two md5s per shingle cost
# ~the same and are exactly replicable in DuckDB.)
_MINHASH_SALT = "#"


#: persisted subplans from in-flight dedup pipelines. The returned
#: DataFrames are lazy, so a persist cannot be dropped inside the call
#: that created it; instead each new dedup call drains the previous
#: entry (one frame live at a time — the same tracked-persist pattern
#: as bm25spark.query), and :func:`release_caches` drains explicitly.
_live_persists: list[DataFrame] = []


def _persist_tracked(df: DataFrame) -> DataFrame:
    release_caches()
    df = df.persist()
    _live_persists.append(df)
    return df


def release_caches() -> None:
    """Unpersist any subplan left behind by a prior dedup pipeline
    (minhash signatures / simhash codes / shingle explode)."""
    while _live_persists:
        try:
            _live_persists.pop().unpersist()
        except Exception:
            pass


# ---------------------------------------------------------------- exact ----

def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: every content group with its size and
    keeper (minimum doc_id). One shuffle."""
    return (
        spread_small_scan(docs.filter(F.col("text").isNotNull()))
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

def _with_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, _sh) where _sh = distinct word-3-gram shingles of the
    simple-analyzer tokens.

    Two separate projections on purpose: the token array must bind to
    a *column attribute* before the shingle expression uses it. A
    lambda that references the split() expression directly re-tokenizes
    the whole text once per array element (measured 15x slower). The
    sliding window is zip_with over three shifted slices — per-element
    work is just two concats, and nothing here shuffles."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda s: s != ""
    )
    base = spread_small_scan(docs.filter(F.col("text").isNotNull())).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), toks.alias("_t")
    )
    m = F.greatest(F.size("_t") - (SHINGLE_WORDS - 1), F.lit(0))
    parts = [F.slice("_t", i + 1, m) for i in range(SHINGLE_WORDS)]
    sh = F.zip_with(
        parts[0],
        F.zip_with(parts[1], parts[2], lambda a, b: F.concat_ws(" ", a, b)),
        lambda a, bc: F.concat_ws(" ", a, bc),
    )
    return base.select("doc_id", F.array_distinct(sh).alias("_sh"))


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

def _signatures(docs: DataFrame) -> DataFrame:
    """Per-doc MinHash signature, unsorted — ONE narrow Arrow-batched
    pass (r7 optimization round; value-identical to the old explode +
    JVM-md5 + groupBy form, which the SQL oracle still pins). Per
    document: simple-analyzer tokens, distinct word-3-gram shingles,
    two md5s per shingle (hashlib — Spark's Md5 expression pays a
    MessageDigest provider lookup per call, ~20x slower) sliced into
    eight independent big-endian 32-bit words, running minimum per
    slice. sig_j = min over shingles of word j of
    md5(shingle) / md5(shingle || '#'). No shuffle at all: the old
    form exploded every shingle and aggregated back per doc. A
    per-task memo dedups md5 work across documents (duplicate-heavy
    corpora are the whole point of this module). Docs with fewer than
    SHINGLE_WORDS tokens get no row (matching the SQL oracle)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType(), False)]
        + [StructField(f"sig{j}", LongType(), True) for j in range(N_HASHES)]
    )
    salt = _MINHASH_SALT.encode()

    def gen(batches):
        import hashlib
        import re
        import struct

        tok_re = re.compile("[a-z0-9]+")
        md5 = hashlib.md5
        unpack = struct.Struct(">4I").unpack
        memo: dict[str, tuple] = {}
        for pdf in batches:
            out_ids, out_sigs = [], []
            for did, text in zip(pdf["doc_id"].to_numpy(), pdf["text"]):
                if text is None:
                    continue
                toks = tok_re.findall(text.lower())
                if len(toks) < SHINGLE_WORDS:
                    continue
                mins = [1 << 40] * N_HASHES
                seen = set()
                if len(memo) > 2_000_000:
                    memo.clear()
                for i in range(len(toks) - (SHINGLE_WORDS - 1)):
                    sh = " ".join(toks[i : i + SHINGLE_WORDS])
                    if sh in seen:
                        continue
                    seen.add(sh)
                    words = memo.get(sh)
                    if words is None:
                        b = sh.encode()
                        words = memo[sh] = unpack(md5(b).digest()) + unpack(
                            md5(b + salt).digest()
                        )
                    for j in range(N_HASHES):
                        if words[j] < mins[j]:
                            mins[j] = words[j]
                out_ids.append(did)
                out_sigs.append(mins)
            if out_ids:
                cols = list(zip(*out_sigs))
                yield pd.DataFrame(
                    {
                        "doc_id": out_ids,
                        **{f"sig{j}": cols[j] for j in range(N_HASHES)},
                    }
                )

    return (
        spread_small_scan(docs.filter(F.col("text").isNotNull()))
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
        .mapInPandas(gen, schema)
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-doc MinHash signature: sig_j = min over shingles of the
    j-th independent 32-bit hash (8-hex slice of md5(shingle) /
    md5(shingle || '#')), j in 0..7. Docs with no shingles get no row
    (matching the SQL oracle)."""
    return _signatures(docs).orderBy("doc_id")


_SIG_AGGS_SQL = ",\n       ".join(
    f"min(('0x' || substr(m{j // 4}, {(j % 4) * 8 + 1}, 8))::BIGINT)"
    f" AS sig{j}"
    for j in range(N_HASHES)
)
_HASHED_SQL = f"""
hashed AS (
  SELECT doc_id, md5(shingle) AS m0,
         md5(shingle || '{_MINHASH_SALT}') AS m1
  FROM shing
)"""


def minhash_signatures_sql() -> str:
    return f"""
WITH {_SHINGLES_SQL},
{_HASHED_SQL}
SELECT doc_id::BIGINT AS doc_id,
       {_SIG_AGGS_SQL}
FROM hashed GROUP BY doc_id ORDER BY doc_id
"""


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """LSH banding: band b = md5(sig_{2b} || sig_{2b+1}); docs sharing
    any band become a candidate pair, scored by the fraction of
    matching signature components (the MinHash Jaccard estimate).

    The signature subplan is persisted and the sig vector rides along
    the band explode, so the shingle pipeline runs exactly once and the
    estimate is computed *at* the self-join — no back-joins. At scale
    the only shuffle is the band-hash self-join, whose fan-out is
    bounded by bucket size (AQE skew-join splits pathological bands).
    """
    sig = _persist_tracked(_signatures(docs))
    packed = sig.select(
        "doc_id",
        F.array(*[F.col(f"sig{j}") for j in range(N_HASHES)]).alias("sigs"),
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col(f"sig{2*b}").cast("string"),
                            F.col(f"sig{2*b+1}").cast("string"),
                        )
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band_hash"),
    )
    est = (
        F.aggregate(
            F.zip_with(
                F.col("a.sigs"),
                F.col("b.sigs"),
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / float(N_HASHES)
    )
    return (
        packed.alias("a")
        .join(packed.alias("b"), "band_hash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(est, 4).alias("est_jaccard"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def minhash_candidate_pairs_sql() -> str:
    band_exprs = ",\n         ".join(
        f"md5(sig{2*b}::VARCHAR || '|' || sig{2*b+1}::VARCHAR) AS band{b}"
        for b in range(N_BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(N_BANDS))
    est = " + ".join(
        f"(CASE WHEN a.sig{j} = b.sig{j} THEN 1 ELSE 0 END)"
        for j in range(N_HASHES)
    )
    return f"""
WITH {_SHINGLES_SQL},
{_HASHED_SQL},
sig AS (
  SELECT doc_id::BIGINT AS doc_id, {_SIG_AGGS_SQL}
  FROM hashed GROUP BY doc_id
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
    # high bit of hex nibble j of a precomputed md5 hex column ``h``:
    # 1 for chars 89abcdef
    c = F.substring(F.col("h"), j + 1, 1)
    return F.when(c.isin(*"89abcdef"), 1).otherwise(-1)


def simhash(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over distinct word shingles: bit j = sign of the
    sum over shingles of (+1/-1 by the high bit of md5 nibble j).
    Explode -> md5 once per shingle row -> 16 codegen'd conditional
    sums in one hash aggregation."""
    ex = (
        _with_shingles(docs)
        .select("doc_id", F.explode("_sh").alias("shingle"))
        .select("doc_id", F.md5("shingle").alias("h"))
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


def simhash_hamming_pairs(docs: DataFrame, max_dist: int = 3) -> DataFrame:
    """Near-dup candidate pairs by SimHash Hamming distance <= max_dist.

    Banding with the pigeonhole guarantee: the 16-bit code splits into
    4 nibbles; two codes within distance 3 agree on at least one whole
    nibble, so the band self-join has full recall for max_dist <= 3.
    Exact distance is then one xor+bit_count per candidate — at scale
    the only shuffle is the band join, fan-out bounded by band-bucket
    size."""
    sh = _persist_tracked(simhash(docs))
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(bnd)),
                        F.shiftrightunsigned(F.col("simhash"), 4 * bnd)
                        .bitwiseAND(F.lit(15))
                        .cast("string"),
                    )
                    for bnd in range(4)
                ]
            )
        ).alias("band"),
    )
    dist = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        bands.alias("a")
        .join(bands.alias("b"), "band")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def simhash_hamming_pairs_sql(max_dist: int = 3) -> str:
    sums = ",\n       ".join(
        f"sum(CASE WHEN substr(h, {j + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH {_SHINGLES_SQL},
hx AS (SELECT doc_id, md5(shingle) AS h FROM shing),
sums AS (
  SELECT doc_id::BIGINT AS doc_id, {sums}
  FROM hx GROUP BY doc_id
),
sh AS (SELECT doc_id, ({fp})::BIGINT AS simhash FROM sums),
bands AS (
  SELECT doc_id, simhash,
         b.band_no::VARCHAR || ':' || (((simhash >> (4 * b.band_no)) & 15))::VARCHAR AS band
  FROM sh, (SELECT unnest([0,1,2,3]) AS band_no) b
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM bands a JOIN bands b USING (band)
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_dist}
ORDER BY doc_a, doc_b
"""


# -------------------------------------------------------- n-gram jaccard ----

def ngram_jaccard_pairs(docs: DataFrame, limit: int = 20) -> DataFrame:
    """Exact Jaccard over distinct word-3-gram shingle sets for all
    pairs sharing at least one shingle; top pairs. The exact verifier
    for the MinHash estimate."""
    # carry the per-doc shingle-set size alongside each exploded row so
    # the Jaccard denominator needs no back-join; persist so the
    # shingle pipeline runs once for both sides of the self-join.
    ex = _persist_tracked(
        _with_shingles(docs)
        .select("doc_id", F.size("_sh").alias("n_sh"),
                F.explode("_sh").alias("shingle"))
    )
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count("*").alias("inter"),
            F.first(F.col("a.n_sh")).alias("na"),
            F.first(F.col("b.n_sh")).alias("nb"),
        )
    )
    return (
        inter.select(
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


# ------------------------------------------------- connected components ----

def connected_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    out_id: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components of an undirected pair graph: every vertex
    appearing in at least one pair, labeled with its component id =
    the minimum vertex id reachable through pair edges.

    Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round rewires
    every vertex's larger neighbors to its neighborhood minimum
    (large-star) then its smaller neighbors + itself to that minimum
    (small-star). Both steps preserve connectivity, shrink the graph
    toward min-centered stars, and converge in O(log n) rounds — so a
    diameter-n chain needs ~log2(n) rounds, not n (the min-label
    propagation this replaces was O(diameter) and raised on long
    chains). The edge frame is eagerly local-checkpointed each round
    so the plan doesn't grow with the iteration count.

    Returns (out_id, component_id) sorted by out_id.
    """
    p = pairs.select(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    vertices = (
        p.select(F.col("_a").alias("_v"))
        .unionByName(p.select(F.col("_b").alias("_v")))
        .distinct()
        .persist()
    )
    e = (
        p.filter(F.col("_a") != F.col("_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(df: DataFrame) -> DataFrame:
        return df.unionByName(
            df.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
        )

    def _mins(sym: DataFrame) -> DataFrame:
        # m(u) = min(Γ(u) ∪ {u})
        return (
            sym.groupBy("_a")
            .agg(F.min("_b").alias("_nm"))
            .select("_a", F.least(F.col("_a"), F.col("_nm")).alias("_m"))
        )

    def _large_star(df: DataFrame) -> DataFrame:
        # for every u: connect each strictly-larger neighbor to m(u)
        sym = _sym(df)
        return (
            sym.filter(F.col("_b") > F.col("_a"))
            .join(_mins(sym), "_a")
            .select(F.col("_b").alias("_a"), F.col("_m").alias("_b"))
            .filter(F.col("_a") != F.col("_b"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # for every u: connect each not-larger neighbor AND u itself
        # to m(u)
        sym = _sym(df)
        m = _mins(sym)
        lesser = (
            sym.filter(F.col("_b") < F.col("_a"))
            .join(m, "_a")
            .select(F.col("_b").alias("_a"), F.col("_m").alias("_b"))
        )
        own = m.select("_a", F.col("_m").alias("_b"))
        return (
            lesser.unionByName(own)
            .filter(F.col("_a") != F.col("_b"))
            .distinct()
        )

    converged = e.isEmpty()
    for _ in range(max_iters):
        if converged:
            break
        new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # fixed point: identical edge SETS (both directions checked —
        # a round may drop and add edges keeping the count equal)
        converged = (
            new.subtract(e).isEmpty() and e.subtract(new).isEmpty()
        )
        e = new
    if not converged:
        # never return partially-contracted stars as if they were
        # components — fail loudly (max_iters=20 covers n ~ 2^20+
        # under the O(log n) bound; hitting this means a bug)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "large-star/small-star rounds; raise max_iters"
        )
    # converged edges are min-centered stars: _b < _a always, every
    # non-center vertex appears exactly once as _a. Centers and
    # singleton vertices label themselves.
    labels = vertices.join(
        e.select(F.col("_a").alias("_v"), F.col("_b").alias("label")),
        "_v",
        "left",
    ).select("_v", F.coalesce(F.col("label"), F.col("_v")).alias("label"))
    out = (
        labels.select(
            F.col("_v").cast("bigint").alias(out_id),
            F.col("label").cast("bigint").alias("component_id"),
        )
        .orderBy(out_id)
        .localCheckpoint(eager=True)
    )
    vertices.unpersist()
    return out


def dedup_components(docs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Duplicate *clusters* from the MinHash candidate-pair graph —
    the canonical-keeper assignment a dedup pipeline applies after
    pair generation (keep ``doc_id == component_id``, drop the rest).
    See :func:`connected_components` for the propagation scheme.

    Returns (doc_id, component_id) sorted by doc_id.
    """
    pairs = minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    return connected_components(
        pairs, "doc_a", "doc_b", out_id="doc_id", max_iters=max_iters
    )


def dedup_components_sql() -> str:
    """Recursive-CTE oracle: component id = min vertex reachable in
    the (symmetrized) candidate-pair graph. The pair generation is the
    same CTE chain `minhash_candidate_pairs_sql` hash-matches."""
    band_exprs = ",\n         ".join(
        f"md5(sig{2*b}::VARCHAR || '|' || sig{2*b+1}::VARCHAR) AS band{b}"
        for b in range(N_BANDS)
    )
    band_list = ", ".join(f"band{b}" for b in range(N_BANDS))
    return f"""
WITH RECURSIVE {_SHINGLES_SQL},
{_HASHED_SQL},
sig AS (
  SELECT doc_id::BIGINT AS doc_id, {_SIG_AGGS_SQL}
  FROM hashed GROUP BY doc_id
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
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(v, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.r
)
SELECT v::BIGINT AS doc_id, min(r)::BIGINT AS component_id
FROM walk GROUP BY v ORDER BY doc_id
"""


def substring_dup_spans(docs: DataFrame, k: int = 40) -> DataFrame:
    """Cross-document duplicate SPANS: maximal character ranges made
    of ``k``-char windows that appear verbatim in >= 2 distinct docs —
    the span-level exact-substring dedup of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL 2022), re-shaped
    for Spark. Their suffix array is a single-machine structure; the
    distributed equivalent is anchor k-grams: every length-k window is
    an anchor, an anchor is *duplicated* if its text occurs in another
    document, and the union of duplicated anchor windows (merged while
    they overlap or touch) is exactly the set of characters lying
    inside some cross-doc duplicated substring of length >= k.

    Plan shape at scale (reworked in the r7 optimization round —
    same results, 6.5x faster at the driver's bench scale): one
    explode (positions stay inside the row's partition, no shuffle),
    then ONE shuffle — a window over TWO independent xxhash64s of the
    window bytes (16 bytes total — the 40-char gram itself never
    shuffles, and at the 10^14-window scale of a 100 TB corpus a
    single 64-bit key would expect ~n²/2^65 collisions, each silently
    marking non-duplicate text as duplicated; the 128-bit pair drives
    that expectation to ~10^-10) computing min/max doc_id per gram
    (min != max <=> >= 2 distinct docs — replaces the old
    count_distinct + semi-join-back, saving an Exchange and a second
    pass over every window), then a hash-aggregated per-doc
    gaps-and-islands merge over the anchor ARRAY (bounded by the
    doc's own window count, so no 10^14-row sort window). The gram
    hashed is the UTF-8 bytes of the char window: for all-ASCII text
    that is an O(1) byte slice of the encoded doc — the old
    substring(text, p, k) walks codepoints, O(p) per window, i.e.
    QUADRATIC per document — with the exact char-substring path kept
    for non-ASCII docs (both paths hash the same gram bytes, so
    grouping across mixed docs is unchanged). The oracle groups by
    the gram itself, so any residual hash collision would surface as
    a gate mismatch at verification scales.

    Returns (doc_id, span_start, span_end, span_len) with 1-based
    inclusive char positions, sorted by (doc_id, span_start).
    """
    base = spread_small_scan(docs.filter(F.length("text") >= k)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.encode(F.col("text"), "UTF-8").alias("_bin"),
        (F.octet_length("text") == F.length("text")).alias("_ascii"),
        "text",
    )
    pos = base.select(
        "doc_id",
        "_ascii",
        "_bin",
        "text",
        F.expr(f"explode(sequence(1, length(text) - {k} + 1))").alias("p"),
    )
    # byte slice == char window for ASCII docs; non-ASCII docs pay the
    # codepoint walk but hash the identical gram bytes
    win = F.when(F.col("_ascii"), F.expr(f"substring(_bin, p, {k})")).otherwise(
        F.encode(F.expr(f"substring(text, p, {k})"), "UTF-8")
    )
    pos = pos.select(
        "doc_id",
        F.col("p").cast("bigint").alias("p"),
        F.xxhash64(win).alias("h"),
        # second independent 64 bits: Spark chains multi-column
        # hashes (first column's hash seeds the next), so the salt
        # must come FIRST — xxhash64(gram, salt) would be a pure
        # function of h and add zero collision resistance
        F.xxhash64(F.lit("#2"), win).alias("h2"),
    )
    w2 = Window.partitionBy("h", "h2")
    anchors = (
        pos.withColumn("_mn", F.min("doc_id").over(w2))
        .withColumn("_mx", F.max("doc_id").over(w2))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("doc_id", "p")
    )
    # gaps-and-islands over the per-doc sorted anchor array: a new
    # island starts exactly when p - prev > k (strictly past adjacency
    # — touching spans merge). The array is bounded by the document's
    # own window count, so this is a hash aggregation + O(anchors)
    # in-row pass instead of a global sort window.
    agg = anchors.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("p")).alias("ps")
    )
    agg = agg.withColumn(
        "st",
        F.expr(
            "filter(sequence(1, size(ps)), i -> i = 1 OR "
            f"element_at(ps, i) - element_at(ps, i - 1) > {k})"
        ),
    )
    spans = agg.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(st)), j -> named_struct("
                "'s', element_at(ps, element_at(st, j)), "
                "'e', IF(j < size(st), "
                "element_at(ps, element_at(st, j + 1) - 1), "
                "element_at(ps, size(ps)))))"
            )
        ).alias("_j", "sp"),
    )
    return (
        spans.select(
            "doc_id",
            F.col("sp.s").alias("span_start"),
            (F.col("sp.e") + k - 1).alias("span_end"),
            (F.col("sp.e") - F.col("sp.s") + k).alias("span_len"),
        )
        .orderBy("doc_id", "span_start")
    )


def substring_dup_spans_sql(k: int = 40) -> str:
    """Exact oracle: identical construction grouping by the gram text
    itself (no hash), unnest(generate_series) for positions, and the
    same gaps-and-islands merge."""
    return f"""
WITH pos AS (
  SELECT doc_id::BIGINT AS doc_id,
         unnest(generate_series(1::BIGINT, length(text) - {k - 1})) AS p,
         text
  FROM documents WHERE length(text) >= {k}
),
pg AS (SELECT doc_id, p, substr(text, p::INT, {k}) AS gram FROM pos),
dups AS (
  SELECT gram FROM pg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
anch AS (SELECT doc_id, p FROM pg WHERE gram IN (SELECT gram FROM dups)),
brk AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) > {k}
              THEN 1 ELSE 0 END AS b
  FROM anch
),
grp AS (
  SELECT doc_id, p, sum(b) OVER (PARTITION BY doc_id ORDER BY p) AS g
  FROM brk
)
SELECT doc_id, min(p) AS span_start, max(p) + {k - 1} AS span_end,
       max(p) - min(p) + {k} AS span_len
FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start
"""


def dedup_keep_canonical(docs: DataFrame, max_iters: int = 20) -> DataFrame:
    """The end of the dedup pipeline: ONE row per input document with
    the keep/drop decision a training-data build actually applies.
    Canonical id = the component id from the MinHash candidate-pair
    graph (:func:`dedup_components`); documents outside any candidate
    pair are their own canonical. ``keep`` is true exactly for the
    minimum doc_id of each duplicate cluster and for all singletons.

    Scale shape: components over the pair graph (O(log n) rounds),
    then one left join of the full corpus against the labeled vertex
    set. Only docs that appeared in a candidate pair carry a label,
    but on a heavily duplicated corpus that set is O(corpus) — so no
    forced broadcast hint: AQE broadcasts when the labeled side is
    actually small and shuffle-joins when it isn't.

    Returns (doc_id, canonical_id, keep) sorted by doc_id.
    """
    comp = dedup_components(docs, max_iters=max_iters).select(
        "doc_id", "component_id"
    )
    return (
        docs.select(F.col("doc_id").cast("bigint").alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id")).alias(
                "canonical_id"
            ),
            (
                F.coalesce(F.col("component_id"), F.col("doc_id"))
                == F.col("doc_id")
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


def dedup_keep_canonical_sql() -> str:
    """Oracle: the recursive-CTE component labeling wrapped as a
    subquery, left-joined to the full corpus."""
    comp = dedup_components_sql()
    return f"""
WITH comp AS ({comp})
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(c.component_id, d.doc_id)::BIGINT AS canonical_id,
       (coalesce(c.component_id, d.doc_id) = d.doc_id) AS keep
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
ORDER BY doc_id
"""
