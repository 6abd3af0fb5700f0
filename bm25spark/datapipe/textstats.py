"""Text analysis operators: token counting, language-ID heuristic,
quality scoring, document fingerprinting. Pure built-in expressions
with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyze import SNOWBALL_STOPWORDS
from .util import spread_small_scan

_STOP = sorted(SNOWBALL_STOPWORDS)

#: every char counted by the old punct regex [a-zA-Z0-9 ] complement —
#: kept as an explicit literal so translate() (a char-table lookup,
#: no regex engine, no replaced-string allocation) counts the exact
#: same class
_ALNUM_SPACE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
)


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token/char statistics: whitespace token count, simple
    token count, char count, digit ratio, punctuation-ish ratio,
    stopword ratio, mean token length.

    The per-doc char stats are computed in a narrow projection
    (digit/punct counts via translate() — a char-table delete +
    length diff, counting exactly the regex classes the oracle uses
    but without running a regex engine or allocating the replaced
    string; measured 3x on the bench corpus), then tokens are
    exploded and aggregated back per doc in one partial-aggregated
    shuffle. The stopword test is isin() on the
    exploded token — Catalyst compiles the 175-literal In to an InSet
    hash lookup (O(1) per token, inside whole-stage codegen), which
    measures ~2x faster than any per-element array predicate (those
    run interpreted). The per-doc scalars ride through the groupBy as
    grouping keys; map-side combine keeps the shuffle at one row per
    doc per partition."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda s: s != ""
    )
    wtoks = F.filter(F.split(F.col("text"), "\\s+"), lambda s: s != "")
    base = spread_small_scan(docs.filter(F.col("text").isNotNull())).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.length("text").alias("_n_char"),
        (
            F.length("text")
            - F.length(F.translate(F.col("text"), "0123456789", ""))
        ).alias("_n_digit"),
        F.length(F.translate(F.col("text"), _ALNUM_SPACE, "")).alias(
            "_n_punct"
        ),
        F.size(wtoks).alias("_n_ws"),
        toks.alias("_t"),
    )
    keys = ["doc_id", "_n_char", "_n_digit", "_n_punct", "_n_ws"]
    g = (
        base.select(*keys, F.explode_outer("_t").alias("token"))
        .groupBy(*keys)
        .agg(
            F.count("token").alias("_n_tok"),
            F.coalesce(
                F.sum(F.when(F.col("token").isin(*_STOP), 1).otherwise(0)),
                F.lit(0),
            ).alias("_n_stop"),
            F.coalesce(F.sum(F.length("token")), F.lit(0)).alias("_sum_len"),
        )
    )
    n_tok, n_char = F.col("_n_tok"), F.col("_n_char")
    return g.select(
        "doc_id",
        F.col("_n_ws").cast("bigint").alias("n_ws_tokens"),
        n_tok.cast("bigint").alias("n_tokens"),
        n_char.cast("bigint").alias("n_chars"),
        F.round(F.col("_n_digit") / F.greatest(n_char, F.lit(1)), 4).alias(
            "digit_ratio"
        ),
        F.round(F.col("_n_punct") / F.greatest(n_char, F.lit(1)), 4).alias(
            "punct_ratio"
        ),
        F.round(F.col("_n_stop") / F.greatest(n_tok, F.lit(1)), 4).alias(
            "stop_ratio"
        ),
        F.round(F.col("_sum_len") / F.greatest(n_tok, F.lit(1)), 4).alias(
            "mean_tok_len"
        ),
    ).orderBy("doc_id")


def text_stats_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in _STOP)
    return f"""
WITH base AS (
  SELECT doc_id,
         text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS tok,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS wtok
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id::BIGINT AS doc_id,
       len(wtok)::BIGINT AS n_ws_tokens,
       len(tok)::BIGINT AS n_tokens,
       length(text)::BIGINT AS n_chars,
       round(length(regexp_replace(text, '[^0-9]', '', 'g'))
             / greatest(length(text), 1), 4) AS digit_ratio,
       round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
             / greatest(length(text), 1), 4) AS punct_ratio,
       round(len(list_filter(tok, t -> t IN ({stop_list})))
             / greatest(len(tok), 1), 4) AS stop_ratio,
       round(list_sum(list_transform(tok, t -> length(t)))
             / greatest(len(tok), 1), 4) AS mean_tok_len
FROM base ORDER BY doc_id
"""


def text_quality(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1] + language guess.

    score = 0.4 * min(n_tokens, 200)/200
          + 0.3 * (1 - digit_ratio)
          + 0.3 * min(stop_ratio * 4, 1)   (fluent text has stopwords)
    lang_guess = 'en' when stop_ratio >= 0.05 else 'other'
    (an n-gram/stopword-ratio heuristic; the synthetic corpus carries
    its true lang column for comparison downstream).
    """
    s = text_stats(docs)
    score = (
        F.lit(0.4) * F.least(F.col("n_tokens"), F.lit(200)) / 200.0
        + F.lit(0.3) * (F.lit(1.0) - F.col("digit_ratio"))
        + F.lit(0.3) * F.least(F.col("stop_ratio") * 4.0, F.lit(1.0))
    )
    return s.select(
        "doc_id",
        F.round(score, 4).alias("quality"),
        F.when(F.col("stop_ratio") >= 0.05, "en").otherwise("other").alias(
            "lang_guess"
        ),
    ).orderBy("doc_id")


def text_quality_sql() -> str:
    stop_list = ", ".join(f"'{s}'" for s in _STOP)
    return f"""
WITH base AS (
  SELECT doc_id,
         text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS tok
  FROM documents WHERE text IS NOT NULL
),
feat AS (
  SELECT doc_id,
         len(tok) AS n_tokens,
         round(length(regexp_replace(text, '[^0-9]', '', 'g'))
               / greatest(length(text), 1), 4) AS digit_ratio,
         round(len(list_filter(tok, t -> t IN ({stop_list})))
               / greatest(len(tok), 1), 4) AS stop_ratio
  FROM base
)
SELECT doc_id::BIGINT AS doc_id,
       round(0.4 * least(n_tokens, 200) / 200.0
             + 0.3 * (1.0 - digit_ratio)
             + 0.3 * least(stop_ratio * 4.0, 1.0), 4) AS quality,
       CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'other' END AS lang_guess
FROM feat ORDER BY doc_id
"""


def text_fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercase text with
    whitespace runs collapsed — catches trivially-reformatted dups."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    return (
        spread_small_scan(docs.filter(F.col("text").isNotNull()))
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.md5(norm).alias("fingerprint"),
        )
        .orderBy("doc_id")
    )


def text_fingerprint_sql() -> str:
    return """
SELECT doc_id::BIGINT AS doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents WHERE text IS NOT NULL ORDER BY doc_id
"""


# ------------------------------------------------------------- PII flags ----

# Patterns chosen to mean the same thing under Java regex (Spark) and
# RE2 (DuckDB): no lookarounds, no \s (the engines' \s classes
# differ by \x0B), explicit character classes only.
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_urls": r"https?://[^ \t\n\r]+",
    "n_ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "n_phones": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
}


def text_pii_flags(docs: DataFrame) -> DataFrame:
    """Per-doc PII indicator counts (emails / URLs / IPv4 / phone-like
    digit runs) — the redaction-or-drop gate of a training-data
    pipeline. Pure codegen ``regexp_count`` expressions; both engines
    count non-overlapping leftmost matches, so the DuckDB oracle is
    exact."""
    counts = [
        F.regexp_count(F.col("text"), F.lit(pat)).cast("bigint").alias(name)
        for name, pat in PII_PATTERNS.items()
    ]
    out = spread_small_scan(docs.filter(F.col("text").isNotNull())).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), *counts
    )
    any_pii = None
    for name in PII_PATTERNS:
        c = F.col(name) > 0
        any_pii = c if any_pii is None else (any_pii | c)
    return out.withColumn("has_pii", any_pii).orderBy("doc_id")


def text_pii_flags_sql() -> str:
    cols = ",\n       ".join(
        f"length(regexp_extract_all(text, '{pat}'))::BIGINT AS {name}"
        for name, pat in PII_PATTERNS.items()
    )
    flags = " OR ".join(f"{name} > 0" for name in PII_PATTERNS)
    return f"""
WITH c AS (
  SELECT doc_id::BIGINT AS doc_id,
       {cols}
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, n_emails, n_urls, n_ipv4, n_phones, ({flags}) AS has_pii
FROM c ORDER BY doc_id
"""


# ------------------------------------------------------------ repetition ----

def text_repetition(docs: DataFrame) -> DataFrame:
    """Boilerplate/repetition signals per doc (the Gopher-style
    duplicate-line filters of a training-data pipeline): count of
    non-empty (trimmed) lines, fraction of lines that are repeats of
    an earlier line (1 - distinct/total), and the share of the most
    frequent line. One explode + two hash aggregations, all codegen;
    docs whose text has no non-empty line report zeros."""
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = spread_small_scan(docs.filter(F.col("text").isNotNull())).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        lines.alias("_l"),
    )
    per_line = (
        base.select("doc_id", F.explode("_l").alias("line"))
        .groupBy("doc_id", "line")
        .agg(F.count("*").alias("c"))
    )
    agg = per_line.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_lines"),
        F.count("*").cast("bigint").alias("_distinct"),
        F.max("c").cast("bigint").alias("_maxc"),
    )
    out = (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.round(
                F.when(F.coalesce(F.col("n_lines"), F.lit(0)) == 0, F.lit(0.0))
                .otherwise(
                    F.lit(1.0)
                    - F.col("_distinct") / F.col("n_lines")
                ),
                4,
            ).alias("dup_line_ratio"),
            F.round(
                F.coalesce(F.col("_maxc"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_lines"), F.lit(0)), F.lit(1)),
                4,
            ).alias("top_line_frac"),
        )
    )
    return out.orderBy("doc_id")


def text_repetition_sql() -> str:
    return """
WITH base AS (
  SELECT doc_id::BIGINT AS doc_id,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x <> '') AS l
  FROM documents WHERE text IS NOT NULL
),
per_line AS (
  SELECT doc_id, unnest(l) AS line FROM base
),
cnt AS (
  SELECT doc_id, line, count(*) AS c FROM per_line GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_lines,
         count(*)::BIGINT AS n_distinct, max(c)::BIGINT AS maxc
  FROM cnt GROUP BY 1
)
SELECT b.doc_id,
       coalesce(a.n_lines, 0) AS n_lines,
       round(CASE WHEN coalesce(a.n_lines, 0) = 0 THEN 0.0
                  ELSE 1.0 - a.n_distinct / a.n_lines END, 4)
         AS dup_line_ratio,
       round(coalesce(a.maxc, 0)
             / greatest(coalesce(a.n_lines, 0), 1), 4) AS top_line_frac
FROM base b LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def text_ngram_repetition(docs: DataFrame) -> DataFrame:
    """Word-bigram concentration per doc (the token-level counterpart
    of :func:`text_repetition`'s line stats): total bigram count and
    the share held by the most frequent bigram — high values flag
    looping/generated text. simple-analyzer tokens; the bigram window
    is zip_with over shifted slices (bound to a column attribute
    first — HOF lambdas re-evaluate enclosing expressions per
    element)."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda s: s != ""
    )
    base = spread_small_scan(docs.filter(F.col("text").isNotNull())).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), toks.alias("_t")
    )
    m = F.greatest(F.size("_t") - 1, F.lit(0))
    bi = F.zip_with(
        F.slice("_t", 1, m),
        F.slice("_t", 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    per_bi = (
        base.select("doc_id", F.explode(bi.alias("_b")).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
    )
    agg = per_bi.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.max("c").cast("bigint").alias("_maxc"),
    )
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.round(
                F.coalesce(F.col("_maxc"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)),
                4,
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


def text_ngram_repetition_sql() -> str:
    return """
WITH base AS (
  SELECT doc_id::BIGINT AS doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL
),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t), 1)),
                               i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM base
),
cnt AS (
  SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c)::BIGINT AS maxc
  FROM cnt GROUP BY 1
)
SELECT b.doc_id,
       coalesce(a.n_bigrams, 0) AS n_bigrams,
       round(coalesce(a.maxc, 0)
             / greatest(coalesce(a.n_bigrams, 0), 1), 4) AS top_bigram_frac
FROM base b LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


# ------------------------------------------------------- quality filter ----

#: Gopher-style corpus filter thresholds (Rae et al. 2021's repetition
#: /quality filter family, tuned to the synthetic corpus scale so both
#: keeps and drops occur at every SF). Each rule name doubles as the
#: reason string in the output.
QF_MIN_TOKENS = 5
QF_MAX_TOKENS = 50_000
QF_MAX_DIGIT_RATIO = 0.30
QF_MIN_STOP_RATIO = 0.01
QF_MAX_DUP_LINE_RATIO = 0.30
QF_MAX_TOP_BIGRAM_FRAC = 0.20
QF_MIN_QUALITY = 0.30


def corpus_quality_filter(docs: DataFrame) -> DataFrame:
    """Keep/drop decision per document — the composition a real
    training-data pipeline runs, built from the already-oracle-proven
    signal operators (stats, quality score, duplicate-line and bigram
    repetition) joined on doc_id: (doc_id, keep, reasons) where
    ``reasons`` is the comma-joined sorted list of failed rules
    ('' when kept).

    Thresholds are module constants so the SQL oracle and the Spark
    plan share them; all compared ratios are the operators' 4-dp
    rounded outputs, so boundary decisions agree bit-for-bit across
    engines. Scale shape: four per-doc aggregations (each one
    explode + hash-agg, already shuffle-minimal) joined on doc_id —
    AQE co-partitions the joins; nothing new is collected."""
    s = text_stats(docs).select("doc_id", "n_tokens", "digit_ratio", "stop_ratio")
    q = text_quality(docs).select("doc_id", "quality")
    r = text_repetition(docs).select("doc_id", "dup_line_ratio")
    g = text_ngram_repetition(docs).select("doc_id", "top_bigram_frac")
    j = s.join(q, "doc_id").join(r, "doc_id").join(g, "doc_id")
    rules = [
        ("too_short", F.col("n_tokens") < QF_MIN_TOKENS),
        ("too_long", F.col("n_tokens") > QF_MAX_TOKENS),
        ("digit_heavy", F.col("digit_ratio") > QF_MAX_DIGIT_RATIO),
        ("no_stopwords", F.col("stop_ratio") < QF_MIN_STOP_RATIO),
        ("dup_lines", F.col("dup_line_ratio") > QF_MAX_DUP_LINE_RATIO),
        ("boilerplate", F.col("top_bigram_frac") > QF_MAX_TOP_BIGRAM_FRAC),
        ("low_quality", F.col("quality") < QF_MIN_QUALITY),
    ]
    reason_cols = [
        F.when(cond, F.lit(name)) for name, cond in sorted(rules)
    ]
    reasons = F.concat_ws(",", *reason_cols)  # concat_ws skips NULLs
    return (
        j.select(
            "doc_id",
            (reasons == "").alias("keep"),
            reasons.alias("reasons"),
        )
        .orderBy("doc_id")
    )


def corpus_quality_filter_sql() -> str:
    rules = [
        ("too_short", f"s.n_tokens < {QF_MIN_TOKENS}"),
        ("too_long", f"s.n_tokens > {QF_MAX_TOKENS}"),
        ("digit_heavy", f"s.digit_ratio > {QF_MAX_DIGIT_RATIO}"),
        ("no_stopwords", f"s.stop_ratio < {QF_MIN_STOP_RATIO}"),
        ("dup_lines", f"r.dup_line_ratio > {QF_MAX_DUP_LINE_RATIO}"),
        ("boilerplate", f"g.top_bigram_frac > {QF_MAX_TOP_BIGRAM_FRAC}"),
        ("low_quality", f"q.quality < {QF_MIN_QUALITY}"),
    ]
    reason_sql = ",\n         ".join(
        f"CASE WHEN {cond} THEN '{name}' END"
        for name, cond in sorted(rules)
    )
    return f"""
WITH s AS (SELECT * FROM ( {text_stats_sql()} )),
     q AS (SELECT * FROM ( {text_quality_sql()} )),
     r AS (SELECT * FROM ( {text_repetition_sql()} )),
     g AS (SELECT * FROM ( {text_ngram_repetition_sql()} ))
SELECT s.doc_id,
       concat_ws(',',
         {reason_sql}
       ) = '' AS keep,
       concat_ws(',',
         {reason_sql}
       ) AS reasons
FROM s
JOIN q USING (doc_id)
JOIN r USING (doc_id)
JOIN g USING (doc_id)
ORDER BY s.doc_id
"""
