"""ANSI-SQL (DuckDB-runnable) oracle generators.

Each generator mirrors one Spark pipeline token-for-token: same
``simple`` analyzer (lower + split on non-[a-z0-9] runs), same
quantization table, same BM25 constants — so the driver's side-by-side
value-hash comparison is exact. Scores are rounded to 4 decimals on
both sides and both sides order by (rounded score desc, doc_id asc) to
make float-ulp differences between engines unobservable.
"""

from __future__ import annotations

from .fieldnorm import FIELDNORM_TO_LENGTH


def fieldnorm_values_sql() -> str:
    """256-row VALUES list (lo, hi, qdl) of half-open quantization
    ranges, identical to bm25spark.query._FN_RANGES."""
    hi = list(FIELDNORM_TO_LENGTH[1:]) + [1 << 62]
    return ",".join(
        f"({int(lo)},{int(h)},{int(lo)})" for lo, h in zip(FIELDNORM_TO_LENGTH, hi)
    )


def _tok_cte(table: str, id_col: str, text_col: str) -> str:
    return f"""
tok AS (
  SELECT {id_col} AS doc_id,
         unnest(string_split_regex(lower({text_col}), '[^a-z0-9]+')) AS token
  FROM {table} WHERE {text_col} IS NOT NULL
),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM tok WHERE token <> '' GROUP BY 1, 2
),
dl AS (
  SELECT d.{id_col} AS doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS doc_len
  FROM {table} d LEFT JOIN tf ON d.{id_col} = tf.doc_id
  WHERE d.{text_col} IS NOT NULL GROUP BY 1
)"""


def bm25_topk_sql(
    query_tokens: list[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    qvals = ",".join("('" + t.replace("'", "''") + "')" for t in sorted(set(query_tokens)))
    return f"""
WITH {_tok_cte(table, id_col, text_col)},
fn(lo, hi, qdl) AS (VALUES {fieldnorm_values_sql()}),
qdl AS (
  SELECT dl.doc_id, fn.qdl FROM dl
  JOIN fn ON dl.doc_len >= fn.lo AND dl.doc_len < fn.hi
),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(doc_len)::DOUBLE / count(*) AS avgdl FROM dl
),
q(token) AS (VALUES {qvals}),
dfs AS (
  SELECT token, count(*)::BIGINT AS df FROM tf
  WHERE token IN (SELECT token FROM q) GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n + 1.0) / (dfs.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * qdl.qdl / s.avgdl))) AS raw
  FROM tf
  JOIN dfs USING (token)
  JOIN qdl ON tf.doc_id = qdl.doc_id
  CROSS JOIN stats s
  GROUP BY 1
)
SELECT doc_id::BIGINT AS doc_id, round(raw, 4) AS score
FROM scored WHERE raw > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


def bm25_delta_topk_sql(
    query_tokens: list[str],
    k: int,
    sealed_pred: str,
    live_pred: str,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Growing∪sealed search oracle (O6/Q4 semantics): statistics
    (N, avgdl, df) come from the *sealed* subset only — stale until
    vacuum, tombstoned docs still counted — while candidates are the
    *live* docs (sealed minus deleted, plus visible delta). Terms with
    sealed df = 0 contribute nothing (the inner join against ``dfs``),
    matching the reference's growing-segment scan through the sealed
    dictionary (search.rs:49-62,83-135).

    ``sealed_pred`` / ``live_pred``: SQL predicates over ``doc_id``.
    """
    qvals = ",".join(
        "('" + t.replace("'", "''") + "')" for t in sorted(set(query_tokens))
    )
    return f"""
WITH {_tok_cte(table, id_col, text_col)},
fn(lo, hi, qdl) AS (VALUES {fieldnorm_values_sql()}),
qdl AS (
  SELECT dl.doc_id, fn.qdl FROM dl
  JOIN fn ON dl.doc_len >= fn.lo AND dl.doc_len < fn.hi
),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(doc_len)::DOUBLE / count(*) AS avgdl
  FROM dl WHERE {sealed_pred}
),
q(token) AS (VALUES {qvals}),
dfs AS (
  SELECT token, count(*)::BIGINT AS df FROM tf
  WHERE token IN (SELECT token FROM q) AND {sealed_pred} GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n + 1.0) / (dfs.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * qdl.qdl / s.avgdl))) AS raw
  FROM tf
  JOIN dfs USING (token)
  JOIN qdl ON tf.doc_id = qdl.doc_id
  CROSS JOIN stats s
  WHERE {live_pred.replace('doc_id', 'tf.doc_id')}
  GROUP BY 1
)
SELECT doc_id::BIGINT AS doc_id, round(raw, 4) AS score
FROM scored WHERE raw > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


#: SQL-side regex class mirroring analyze._CJK_RE codepoint-for-
#: codepoint (explicit ranges, NOT \p{Katakana} etc.: script classes
#: exclude script=Common chars like the prolonged sound mark U+30FC
#: that the block ranges deliberately include)
_CJK_SQL_CLASS = (
    r"[\x{2E80}-\x{2EFF}\x{3040}-\x{30FF}\x{3130}-\x{318F}"
    r"\x{31F0}-\x{31FF}"
    r"\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}"
    r"\x{F900}-\x{FAFF}\x{FF65}-\x{FF9F}"
    r"\x{20000}-\x{2EBEF}\x{2F800}-\x{2FA1F}]"
)


def _unicode_tok_cte(corpus_values: str) -> str:
    r"""Tokenization CTEs replicating ``analyze.tokenize_unicode`` over
    an inline VALUES corpus: alphanumeric words (``[\p{L}\p{N}]+`` =
    Python's ``[^\W_]+``), CJK words expanded into overlapping
    character bigrams (lone CJK char stays a unigram). Valid as long
    as every corpus word is single-script (no mixed CJK+latin runs) —
    the micro-corpus is constructed that way."""
    return f"""
corpus(doc_id, text) AS (VALUES {corpus_values}),
words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}]+')) AS w
  FROM corpus WHERE text IS NOT NULL
),
tok AS (
  SELECT doc_id, w AS token FROM words
  WHERE NOT regexp_matches(w, '^{_CJK_SQL_CLASS}+$')
  UNION ALL
  SELECT doc_id, w FROM words
  WHERE regexp_matches(w, '^{_CJK_SQL_CLASS}+$') AND length(w) = 1
  UNION ALL
  SELECT doc_id, substr(w, i::INT, 2) AS token
  FROM words CROSS JOIN LATERAL unnest(range(1, length(w)::BIGINT)) AS t(i)
  WHERE regexp_matches(w, '^{_CJK_SQL_CLASS}+$') AND length(w) >= 2
),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf
  FROM tok WHERE token <> '' GROUP BY 1, 2
),
dl AS (
  SELECT c.doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS doc_len
  FROM corpus c LEFT JOIN tf ON c.doc_id = tf.doc_id
  WHERE c.text IS NOT NULL GROUP BY 1
)"""


def bm25_unicode_topk_sql(
    corpus_rows: list[tuple[int, str]],
    query_tokens: list[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """BM25 top-k oracle under the ``unicode`` (CJK-bigram) analyzer
    over an inline micro-corpus — proves the analyzer end to end in a
    second engine (same scoring shape as :func:`bm25_topk_sql`)."""
    cv = ",".join(
        f"({int(i)}, '" + t.replace("'", "''") + "')" for i, t in corpus_rows
    )
    qvals = ",".join(
        "('" + t.replace("'", "''") + "')" for t in sorted(set(query_tokens))
    )
    return f"""
WITH {_unicode_tok_cte(cv)},
fn(lo, hi, qdl) AS (VALUES {fieldnorm_values_sql()}),
qdl AS (
  SELECT dl.doc_id, fn.qdl FROM dl
  JOIN fn ON dl.doc_len >= fn.lo AND dl.doc_len < fn.hi
),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(doc_len)::DOUBLE / count(*) AS avgdl FROM dl
),
q(token) AS (VALUES {qvals}),
dfs AS (
  SELECT token, count(*)::BIGINT AS df FROM tf
  WHERE token IN (SELECT token FROM q) GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n + 1.0) / (dfs.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * qdl.qdl / s.avgdl))) AS raw
  FROM tf
  JOIN dfs USING (token)
  JOIN qdl ON tf.doc_id = qdl.doc_id
  CROSS JOIN stats s
  GROUP BY 1
)
SELECT doc_id::BIGINT AS doc_id, round(raw, 4) AS score
FROM scored WHERE raw > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


def _scoring_tail_sql(qvals: str, k: int, k1: float, b: float) -> str:
    """The shared fn/qdl/stats/q/dfs/scored pipeline + final select,
    parameterized only by the inlined query-token VALUES — expects
    ``tf`` and ``dl`` CTEs to already be in scope."""
    return f"""
fn(lo, hi, qdl) AS (VALUES {fieldnorm_values_sql()}),
qdl AS (
  SELECT dl.doc_id, fn.qdl FROM dl
  JOIN fn ON dl.doc_len >= fn.lo AND dl.doc_len < fn.hi
),
stats AS (
  SELECT count(*)::DOUBLE AS n, sum(doc_len)::DOUBLE / count(*) AS avgdl FROM dl
),
q(token) AS (VALUES {qvals}),
dfs AS (
  SELECT token, count(*)::BIGINT AS df FROM tf
  WHERE token IN (SELECT token FROM q) GROUP BY 1
),
scored AS (
  SELECT tf.doc_id,
         sum(ln((s.n + 1.0) / (dfs.df + 0.5))
             * (tf.tf * ({k1} + 1.0))
               / (tf.tf + {k1} * (1.0 - {b} + {b} * qdl.qdl / s.avgdl))) AS raw
  FROM tf
  JOIN dfs USING (token)
  JOIN qdl ON tf.doc_id = qdl.doc_id
  CROSS JOIN stats s
  GROUP BY 1
)
SELECT doc_id::BIGINT AS doc_id, round(raw, 4) AS score
FROM scored WHERE raw > 0
ORDER BY score DESC, doc_id LIMIT {k}
"""


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def wordpiece_topk_sql(
    query_tokens: list[str],
    k: int,
    vocab: "list[str]",
    unk: str = "[unk]",
    max_chars: int = 100,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """BM25 top-k oracle under the WordPiece analyzer
    (:func:`bm25spark.analyze.make_wordpiece_analyzer`): the greedy
    longest-match-first segmentation is re-implemented relationally —
    a precomputed longest-piece table per (word, position) plus a
    recursive path walk — so DuckDB reproduces the Spark pipeline's
    subword tokens, [unk] collapses included, bit-for-bit.
    ``query_tokens`` are the already-segmented query pieces (run the
    same analyzer Python-side at SQL-generation time)."""
    qvals = ",".join(f"({_q(t)})" for t in sorted(set(query_tokens)))
    return f"""
WITH RECURSIVE
{_wordpiece_tf_dl_cte(vocab, unk, max_chars, table, id_col, text_col)},
{_scoring_tail_sql(qvals, k, k1, b)}
"""


def _wordpiece_tf_dl_cte(
    vocab: "list[str]",
    unk: str,
    max_chars: int,
    table: str,
    id_col: str,
    text_col: str,
) -> str:
    """The WordPiece tokenization pipeline as CTEs ending in the
    standard ``tf``/``dl`` shape (requires WITH RECURSIVE)."""
    # mirror make_wordpiece_analyzer's normalization exactly:
    # strip + lower BEFORE the ##-prefix classification
    norm = [q for q in (p.strip().lower() for p in vocab) if q]
    initial = sorted({q for q in norm if not q.startswith("##")})
    cont = sorted({q[2:] for q in norm if q.startswith("##") and len(q) > 2})
    vi = ",".join(f"({_q(p)})" for p in initial)
    # a continuation vocab can be empty; VALUES needs >=1 row, so fall
    # back to a piece no [a-z0-9] word can ever contain
    vc = ",".join(f"({_q(p)})" for p in cont) or "('~never~')"
    return f"""wx AS (
  SELECT {id_col} AS doc_id, w
  FROM (
    SELECT {id_col},
           unnest(string_split_regex(lower({text_col}), '[^a-z0-9]+')) AS w
    FROM {table} WHERE {text_col} IS NOT NULL
  ) WHERE w <> ''
),
dw AS (SELECT DISTINCT w FROM wx),
vi(piece) AS (VALUES {vi}),
vc(piece) AS (VALUES {vc}),
pos AS (
  SELECT w, unnest(range(1, length(w)::BIGINT + 1))::INT AS p FROM dw
),
cand AS (
  SELECT pos.w, pos.p, v.piece
  FROM pos JOIN vi v
    ON pos.p = 1 AND substr(pos.w, 1, length(v.piece)) = v.piece
  UNION ALL
  SELECT pos.w, pos.p, v.piece
  FROM pos JOIN vc v
    ON pos.p > 1 AND substr(pos.w, pos.p, length(v.piece)) = v.piece
),
best AS (
  SELECT w, p, max_by(piece, length(piece)) AS piece,
         max(length(piece))::INT AS plen
  FROM cand GROUP BY w, p
),
seg(w, tok, np) AS (
  SELECT b.w, b.piece, 1 + b.plen FROM best b WHERE b.p = 1
  UNION ALL
  SELECT b.w, '##' || b.piece, s.np + b.plen
  FROM seg s JOIN best b ON b.w = s.w AND b.p = s.np
),
okw AS (
  SELECT d.w FROM dw d
  JOIN (SELECT w, max(np) AS maxnp FROM seg GROUP BY w) m ON d.w = m.w
  WHERE m.maxnp = length(d.w) + 1 AND length(d.w) <= {max_chars}
),
wtok AS (
  SELECT s.w, s.tok FROM seg s WHERE s.w IN (SELECT w FROM okw)
  UNION ALL
  SELECT d.w, {_q(unk)} AS tok FROM dw d
  WHERE d.w NOT IN (SELECT w FROM okw)
),
tok AS (
  SELECT wx.doc_id, wtok.tok AS token FROM wx JOIN wtok ON wx.w = wtok.w
),
tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2
),
dl AS (
  SELECT d.{id_col} AS doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS doc_len
  FROM {table} d LEFT JOIN tf ON d.{id_col} = tf.doc_id
  WHERE d.{text_col} IS NOT NULL GROUP BY 1
)"""


def wordpiece_tokens_sql(
    vocab: "list[str]",
    unk: str = "[unk]",
    max_chars: int = 100,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """(doc_id, token, tf) under the WordPiece analyzer — the
    tokenization pipeline alone, for differential testing against the
    Python implementation."""
    return f"""
WITH RECURSIVE
{_wordpiece_tf_dl_cte(vocab, unk, max_chars, table, id_col, text_col)}
SELECT doc_id::BIGINT AS doc_id, token, tf FROM tf
ORDER BY doc_id, token
"""


def custom_vocab_topk_sql(
    raw_query_tokens: list[str],
    k: int,
    top_n: int,
    min_df: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """BM25 top-k oracle under the corpus-trained vocabulary analyzer
    (:func:`bm25spark.api.train_corpus_vocab` +
    :func:`bm25spark.analyze.make_vocab_analyzer`): the *training*
    itself is part of the oracle — the top-``top_n`` tokens by
    (df DESC, token ASC) are selected in SQL, out-of-vocabulary
    corpus AND query tokens drop out, and doc lengths shrink to the
    kept tokens, exactly as the Spark pipeline behaves.
    ``raw_query_tokens`` are the UNfiltered simple-analyzer query
    tokens (the vocabulary filter is applied in SQL)."""
    qvals = ",".join(f"({_q(t)})" for t in sorted(set(raw_query_tokens)))
    # the shared scoring tail needs no explicit query-vocab filter: an
    # out-of-vocabulary query token has no rows in the filtered ``tf``,
    # so its ``dfs`` entry is empty and it contributes nothing —
    # identical to filtering q through vocabt
    return f"""
WITH tfraw AS (
  SELECT * FROM ( WITH {_tok_cte(table, id_col, text_col)} SELECT * FROM tf )
),
vocabt AS (
  SELECT token FROM tfraw GROUP BY token
  HAVING count(*) >= {min_df}
  ORDER BY count(*) DESC, token ASC LIMIT {top_n}
),
tf AS (SELECT * FROM tfraw WHERE token IN (SELECT token FROM vocabt)),
dl AS (
  SELECT d.{id_col} AS doc_id, coalesce(sum(tf.tf), 0)::BIGINT AS doc_len
  FROM {table} d LEFT JOIN tf ON d.{id_col} = tf.doc_id
  WHERE d.{text_col} IS NOT NULL GROUP BY 1
),
{_scoring_tail_sql(qvals, k, k1, b)}
"""


def tokenize_mappings_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """Oracle for the ``tokenize()`` surface (exploded bm25vector
    rows): one (doc, token, tf) row per distinct token, simple
    analyzer."""
    return f"""
WITH {_tok_cte(table, id_col, text_col)}
SELECT doc_id::BIGINT AS doc_id, token, tf::BIGINT AS tf
FROM tf ORDER BY doc_id, token
"""


def corpus_stats_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
WITH {_tok_cte(table, id_col, text_col)}
SELECT count(*)::BIGINT AS n_docs,
       sum(doc_len)::BIGINT AS sum_dl,
       round(sum(doc_len)::DOUBLE / count(*), 4) AS avgdl
FROM dl
"""


def term_df_sql(
    limit: int = 50,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    return f"""
WITH {_tok_cte(table, id_col, text_col)}
SELECT token, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY 1
ORDER BY df DESC, token ASC LIMIT {limit}
"""


def doc_fieldnorm_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
WITH {_tok_cte(table, id_col, text_col)},
fn(lo, hi, qdl) AS (VALUES {fieldnorm_values_sql()})
SELECT dl.doc_id::BIGINT AS doc_id, dl.doc_len AS doc_len, fn.qdl AS qdl
FROM dl JOIN fn ON dl.doc_len >= fn.lo AND dl.doc_len < fn.hi
ORDER BY doc_id
"""


def inspect_storage_sql(
    limit: int = 25,
    shard_size: int = 1 << 14,
    block_size: int = 128,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle for :func:`bm25spark.api.inspect_index`'s (token,
    n_blocks, df) projection — recomputes the physical block layout
    from first principles: internal ids are the build's deterministic
    dense assignment (row_number over the sort key among non-NULL-text
    docs), postings never cross shards, and each (term, shard) run
    packs into ceil(count / block_size) blocks. Assumes every surfaced
    token is raw-interned (< 16 bytes — padded-key byte order then
    equals token order, so the tie-break matches)."""
    return f"""
WITH ids AS (
  SELECT {id_col} AS doc_id,
         (row_number() OVER (ORDER BY {id_col}) - 1) AS iid
  FROM {table} WHERE {text_col} IS NOT NULL
),
{_tok_cte(table, id_col, text_col)},
per_shard AS (
  SELECT tf.token, ids.iid // {shard_size} AS shard, count(*)::BIGINT AS c
  FROM tf JOIN ids USING (doc_id) GROUP BY 1, 2
)
SELECT token,
       sum((c + {block_size} - 1) // {block_size})::BIGINT AS n_blocks,
       sum(c)::BIGINT AS df
FROM per_shard GROUP BY 1
ORDER BY df DESC, token ASC LIMIT {limit}
"""
