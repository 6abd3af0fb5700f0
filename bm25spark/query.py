"""Query-side entry points.

``exact_topk`` is the reference's *seqscan exact scorer* (entry point
3, /root/reference/src/index/operators.rs:22-55 + crates/bm25/src/
evaluate.rs:22-74) restated as a pure Catalyst plan: tokenize ->
tf/df/dl aggregates -> broadcast joins -> one ordered limit. It is the
engine's differential oracle — the fuzz harness in the reference flips
between exactly this and the indexed WAND path (tests/fuzz:217-303).

The indexed WAND path lives in :mod:`bm25spark.wand` /
:mod:`bm25spark.index`.

Scores use the quantized document length (evaluate.rs:36 quantizes via
length_to_fieldnorm before scoring), k1/b/IDF per bm25.rs:285-295.
Ties are broken by ascending doc id — *stronger* than the reference,
whose heap order on ties is unspecified (always_equal payloads), so
every ordering we emit is reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analyze import get_analyzer
from .config import Bm25Config
from .fieldnorm import FIELDNORM_TO_LENGTH
from .udfs import explode_mappings, with_doc_terms

#: half-open quantization ranges (lo, hi, qdl): dl in [lo, hi) -> qdl=lo
_FN_RANGES = [
    (int(lo), int(hi), int(lo))
    for lo, hi in zip(
        FIELDNORM_TO_LENGTH,
        list(FIELDNORM_TO_LENGTH[1:]) + [1 << 62],
    )
]


def quantized_dl(spark: SparkSession, df: DataFrame, dl_col: str = "doc_len"):
    """Join-in the fieldnorm-quantized doc length as ``qdl``.

    A 256-row broadcast range join — the Catalyst equivalent of the
    reference's length_to_fieldnorm binary search (bm25.rs:278-283).
    """
    ranges = spark.createDataFrame(_FN_RANGES, "lo BIGINT, hi BIGINT, qdl BIGINT")
    return df.join(
        F.broadcast(ranges),
        (F.col(dl_col) >= F.col("lo")) & (F.col(dl_col) < F.col("hi")),
        "left",
    ).drop("lo", "hi")


def tokenize_simple_sql(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """simple-analyzer mappings via built-in expressions only (stays
    inside whole-stage codegen; no Python). Returns
    (doc_id, token, tf) with one row per distinct (doc, token)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda s: s != "",
            )
        ).alias("token"),
    )
    return toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))


def tokenize_udf_mappings(
    df: DataFrame, text_col: str, id_col: str, cfg: Bm25Config
) -> DataFrame:
    """Analyzer-general mappings (term keys, not token strings) via the
    fused pandas UDF."""
    prepared = with_doc_terms(df, text_col, cfg.analyzer, cfg.seed)
    return explode_mappings(
        prepared.withColumnRenamed(id_col, "doc_id")
        if id_col != "doc_id"
        else prepared
    )


def exact_topk(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_text: str,
    k: int,
    cfg: Bm25Config | None = None,
    round_score: int | None = 4,
    prefilter: DataFrame | None = None,
) -> DataFrame:
    """Full-precision BM25 top-k as one declarative plan.

    ``prefilter``: optional DataFrame of allowed ``doc_id`` rows,
    applied *before* ranking — the reference's ``bm25.prefilter``
    semantics (candidates must pass the predicate before counting
    toward k; src/index/fetcher.rs:180-216).
    """
    cfg = cfg or Bm25Config()
    analyzer = get_analyzer(cfg.analyzer)
    qtokens = sorted(set(analyzer(query_text)))

    docs = docs.filter(F.col(text_col).isNotNull())

    if cfg.analyzer == "simple":
        mappings = tokenize_simple_sql(docs, text_col, id_col)
    else:
        m = tokenize_udf_mappings(docs, text_col, id_col, cfg)
        # keep token strings out of it: exact path joins on term_key
        from .analyze import intern_str

        qkeys = [intern_str(cfg.seed, t) for t in qtokens]
        mappings = m.select(
            F.col("term_key").alias("token"), "doc_id", "tf"
        )
        qtokens = qkeys  # type: ignore[assignment]

    dls = mappings.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    # docs with zero tokens still count toward N / avgdl (dl = 0)
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    dls = all_docs.join(dls, "doc_id", "left").fillna({"doc_len": 0})

    n_docs, sum_dl = dls.agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("s")
    ).first()
    if not n_docs:
        return spark.createDataFrame([], "doc_id BIGINT, score DOUBLE")
    avgdl = float(sum_dl) / float(n_docs)

    if not qtokens:
        return spark.createDataFrame([], "doc_id BIGINT, score DOUBLE")

    qm = mappings.filter(F.col("token").isin(list(qtokens)))
    dfs = qm.groupBy("token").agg(F.count("*").alias("df"))

    scored = (
        qm.join(F.broadcast(dfs), "token")
        .join(quantized_dl(spark, dls), "doc_id")
        .withColumn(
            "idf",
            F.log((F.lit(float(n_docs) + 1.0)) / (F.col("df") + F.lit(0.5))),
        )
        .withColumn(
            "tfs",
            (F.col("tf") * F.lit(cfg.k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(cfg.k1)
                * (
                    F.lit(1.0 - cfg.b)
                    + F.lit(cfg.b) * F.col("qdl") / F.lit(avgdl)
                )
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum(F.col("idf") * F.col("tfs")).alias("raw_score"))
        .filter(F.col("raw_score") > 0.0)
    )
    if prefilter is not None:
        scored = scored.join(prefilter.select("doc_id"), "doc_id", "left_semi")

    score_col = (
        F.round(F.col("raw_score"), round_score)
        if round_score is not None
        else F.col("raw_score")
    )
    return (
        scored.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            score_col.alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
