"""Model-based quality scoring: corpus-trained bigram language-model
perplexity per document — the CCNet filtering step (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", LREC 2020: score every paragraph by the perplexity of a
reference-corpus LM and keep the low-perplexity head). KenLM is a
single-machine trie; the distributed equivalent for a bigram model is
two hash aggregations (bigram counts, history counts) and one join
back onto each document's bigrams.

Model: add-one-smoothed bigram MLE over the shared engine-portable
pre-tokenizer (:mod:`bm25spark.datapipe.tokenize` — the same one the
BPE trainer uses), trained on the corpus itself unless a separate
``train_docs`` reference corpus is given:

    P(w2 | w1) = (c(w1, w2) + 1) / (c1(w1) + V)

where ``c1`` counts w1 as a bigram history (the row-sum of the bigram
table, so the model is exactly self-consistent) and ``V`` is the
training corpus's distinct-token count (one bounded scalar action).
Per doc: ``avg_nll`` = mean over its bigrams of -ln P, ``ppl`` =
exp(avg_nll); documents with fewer than two tokens score NULL.

Everything is pure Catalyst (explode + two groupBys + one join); the
count tables shuffle on token keys with map-side partial aggregation,
and the scoring join broadcasts nothing by default — AQE picks the
strategy by the trained table's actual size. In the self-trained path
the tokenized frame is persisted (tracked, drained on the next call)
so the corpus is tokenized ONCE for training counts, vocab, and
scoring; with a fixed reference corpus the training aggregations
amortize away entirely and scoring is a single join — the CCNet
deployment shape. Values round to 4 decimals so the DuckDB oracle
(the same construction in SQL) lands on the identical doubles.

No reference counterpart (VectorChord-bm25 is a ranking index); this
is training-data-pipeline surface alongside dedup/decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _persist_tracked, release_caches  # noqa: F401
from .tokenize import words_expr, words_sql
from .util import spread_small_scan

# tracked persists are SHARED with the dedup module (one live frame
# across the whole datapipe at a time, drained on the next tracked
# call or via release_caches) — one implementation, not three


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return spread_small_scan(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr(words_expr(text_col)).alias("toks"),
    )


def _bigrams(toks: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair occurrence."""
    pair_expr = (
        "transform(slice(toks, 1, size(toks) - 1),"
        " (t, i) -> struct(t AS w1, toks[i + 1] AS w2))"
    )
    return (
        toks.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(F.expr(pair_expr)).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
    )


def lm_perplexity(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Score every document by add-one bigram-LM perplexity. Returns
    (doc_id, n_bigrams, avg_nll, ppl) ordered by doc_id; NULL scores
    for documents with < 2 tokens. ``train_docs`` defaults to ``docs``
    (self-trained)."""
    self_trained = train_docs is None
    score_toks = _doc_tokens(docs, text_col)
    if self_trained:
        score_toks = _persist_tracked(score_toks)
        train_toks = score_toks
    else:
        train_toks = _persist_tracked(_doc_tokens(train_docs, text_col))
    bigram_c = _bigrams(train_toks).groupBy("w1", "w2").agg(
        F.count("*").alias("c12")
    )
    history_c = bigram_c.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V: distinct tokens in the training corpus — one bounded scalar
    vocab = (
        train_toks.select(F.explode("toks").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
        .collect()[0]["v"]
    )
    scored = (
        _bigrams(score_toks)
        .join(bigram_c, ["w1", "w2"], "left")
        .join(history_c, ["w1"], "left")
        # an unseen history (possible only with a separate train
        # corpus) contributes the fully-smoothed 1/V mass
        .select(
            "doc_id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab))
            ).alias("lp"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp").alias("s"),
        )
    )
    return (
        docs.select(F.col("doc_id").cast("bigint").alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            F.round(-F.col("s") / F.col("n_bigrams"), 4).alias("avg_nll"),
            F.round(F.exp(-F.col("s") / F.col("n_bigrams")), 4).alias("ppl"),
        )
        .orderBy("doc_id")
    )


def lm_perplexity_sql() -> str:
    """DuckDB oracle: the identical construction — bigram/history
    counts, scalar V, add-one log-probs, per-doc mean — over the same
    ``documents`` view (self-trained)."""
    return f"""
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id, {words_sql("text")} AS t
  FROM documents
),
bi AS (
  SELECT doc_id,
         t[i::INT] AS w1, t[(i + 1)::INT] AS w2
  FROM (
    SELECT doc_id, t,
           unnest(generate_series(1::BIGINT, len(t) - 1)) AS i
    FROM toks WHERE len(t) >= 2
  )
),
bc AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY w1, w2),
hc AS (SELECT w1, sum(c12)::BIGINT AS c1 FROM bc GROUP BY w1),
v AS (SELECT count(DISTINCT w)::BIGINT AS v
      FROM (SELECT unnest(t) AS w FROM toks)),
scored AS (
  SELECT bi.doc_id, count(*)::BIGINT AS n_bigrams,
         sum(ln((bc.c12 + 1)::DOUBLE / (hc.c1 + v.v))) AS s
  FROM bi JOIN bc USING (w1, w2) JOIN hc USING (w1) CROSS JOIN v
  GROUP BY bi.doc_id
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(sc.n_bigrams, 0)::BIGINT AS n_bigrams,
       round(-sc.s / sc.n_bigrams, 4) AS avg_nll,
       round(exp(-sc.s / sc.n_bigrams), 4) AS ppl
FROM documents d LEFT JOIN scored sc ON sc.doc_id = d.doc_id
ORDER BY doc_id
"""
