"""Vectorized (Arrow-batched) tokenization — the only Python/JVM
crossing in the engine. No per-row Python UDFs anywhere.

``with_doc_terms`` fuses tokenize -> per-doc tf aggregation -> intern
into one Arrow map pass so a document crosses the boundary once and
comes back as an already-aggregated sparse vector (the reference's
``Document``: sorted (key, tf) pairs, crates/bm25/src/vector.rs:37-94;
tf merge semantics src/datatype/tsvector.rs:107-127), plus its
``doc_len`` (sum of tfs, vector.rs:76-83).

r7 optimization round: the former pandas UDF ran ``analyze_document``
per document (~40µs: regex findall + Counter + per-token memo lookups
+ tuple sort) and left ``doc_len`` to an interpreted JVM ``aggregate``
over every posting. It is now a Spark 4.1 ``arrow_udf`` — an
expression, so Catalyst still ships ONLY the text column to Python
(a mapInArrow form was tried and regressed the build: the pass-through
of every other column cost more than the kernel saved) — returning a
struct<terms, dl> built directly as Arrow buffers. For the ``simple``
analyzer the whole batch is vectorized: bytes translate+split
tokenization, pd.factorize token coding, run-length (doc, token)
counting, one lexsort by interned key bytes — Python-per-object work
only at the token level, not per (token, doc) pair. Other analyzers
keep the per-document loop (their token semantics are Python-defined)
but still skip the pandas tuple conversion and the JVM doc_len
aggregate. Output is value-identical (pinned by the batch parity test
and every bm25 gate entry).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)

from .analyze import analyze_document, get_analyzer, intern

TERMS_TYPE = ArrayType(
    StructType(
        [
            StructField("key", BinaryType(), False),
            StructField("tf", IntegerType(), False),
        ]
    )
)

_SIMPLE_RE = re.compile(r"[a-z0-9]+")
#: bytes.translate table mapping every byte outside [a-z0-9] to space —
#: ``lowered.encode().translate(_TBL).split()`` produces exactly the
#: [a-z0-9]+ runs of the simple analyzer for ASCII text, at C speed
_TBL = bytes(
    b if chr(b).isascii() and chr(b) in "abcdefghijklmnopqrstuvwxyz0123456789"
    else 0x20
    for b in range(256)
)
_SAT = 0xFFFFFFFF


def _simple_tok_lists(texts):
    """Per-doc token byte-lists for the ``simple`` analyzer: C-speed
    bytes translate+split for ASCII text, the regex for the rest."""
    tok_lists = []
    for t in texts:
        if t is None:
            tok_lists.append([])
            continue
        tl = t.lower()
        if tl.isascii():
            tok_lists.append(tl.encode().translate(_TBL).split())
        else:
            tok_lists.append([w.encode() for w in _SIMPLE_RE.findall(tl)])
    return tok_lists


def _batch_terms(tok_lists, seed: bytes, memo: dict):
    """Batch form of analyze_document over per-doc token byte-lists:
    (pa.ListArray terms, np.int64 doc_len). Analyzer-agnostic — only
    token PRODUCTION is per-analyzer; counting, interning (once per
    unique token via the memo), the key-byte sort and the Arrow
    buffer assembly are vectorized across the whole batch.
    Value-identical to the per-doc analyze_document path: same
    tokens, same interned keys, items sorted by key bytes, saturating
    tf/len."""
    import pandas as pd
    import pyarrow as pa

    n_docs = len(tok_lists)
    lens = np.fromiter((len(x) for x in tok_lists), np.int64, n_docs)
    total = int(lens.sum())
    empty_item_offsets = np.zeros(n_docs + 1, dtype=np.int32)
    if not total:
        st = pa.StructArray.from_arrays(
            [pa.array([], type=pa.binary()), pa.array([], type=pa.int32())],
            names=["key", "tf"],
        )
        terms = pa.ListArray.from_arrays(
            pa.array(empty_item_offsets, type=pa.int32()), st
        )
        return terms, np.zeros(n_docs, dtype=np.int64)

    flat = [tok for toks in tok_lists for tok in toks]
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    if len(memo) > 2_000_000:
        memo.clear()
    get = memo.get
    ukeys = []
    for tok in uniques:
        key = get(tok)
        if key is None:
            key = memo[tok] = intern(seed, tok)
        ukeys.append(key)
    kb = np.frombuffer(b"".join(ukeys), dtype=np.uint8).reshape(-1, 16)
    khi = np.ascontiguousarray(kb[:, :8]).view(">u8").ravel().astype(np.uint64)
    klo = np.ascontiguousarray(kb[:, 8:]).view(">u8").ravel().astype(np.uint64)

    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    order = np.lexsort((codes, doc_idx))
    ds, cs = doc_idx[order], codes[order]
    change = (ds[1:] != ds[:-1]) | (cs[1:] != cs[:-1])
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    d_u, c_u = ds[starts], cs[starts]
    tf = np.diff(np.concatenate((starts, [total])))
    # within each doc, items sorted by interned key bytes (the
    # reference's Document order) — big-endian uint64 halves compare
    # exactly like the 16-byte keys
    order2 = np.lexsort((klo[c_u], khi[c_u], d_u))
    d_s, c_s = d_u[order2], c_u[order2]
    tf_s = np.minimum(tf[order2], _SAT)

    item_lens = np.bincount(d_s, minlength=n_docs)
    offsets = np.concatenate(([0], np.cumsum(item_lens))).astype(np.int32)
    n_items = len(c_s)
    keys_concat = b"".join(ukeys[c] for c in c_s)
    koff = (np.arange(n_items + 1, dtype=np.int32) * 16).tobytes()
    keys_arr = pa.Array.from_buffers(
        pa.binary(), n_items, [None, pa.py_buffer(koff), pa.py_buffer(keys_concat)]
    )
    st = pa.StructArray.from_arrays(
        # int64 -> int32 through pa.array: raises loudly on overflow
        # (an astype would wrap silently; unreachable at sane doc
        # sizes either way — tf saturates at 2^32-1)
        [keys_arr, pa.array(tf_s, type=pa.int32())],
        names=["key", "tf"],
    )
    terms = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), st)
    # doc_len = saturating sum of the (saturated) per-item tfs —
    # bincount weights stay exact (integer sums < 2^53)
    doc_len = np.minimum(
        np.bincount(d_s, weights=tf_s.astype(np.float64), minlength=n_docs),
        _SAT,
    ).astype(np.int64)
    return terms, doc_len


def doc_terms_udf(analyzer_name: str, seed: bytes):
    """arrow_udf: text column -> struct<terms array<struct<key binary,
    tf int>>, dl int>, batches in and out as Arrow arrays."""
    import pyarrow as pa

    analyzer = get_analyzer(analyzer_name)
    simple = analyzer_name == "simple"
    memo: dict = {}

    @F.arrow_udf(
        "struct<terms: array<struct<key: binary, tf: int>>, dl: int>"
    )
    def _analyze(texts: pa.Array) -> pa.Array:
        tl = texts.to_pylist()
        if simple:
            tok_lists = _simple_tok_lists(tl)
        else:
            tok_lists = [
                [] if t is None else [w.encode() for w in analyzer(t)]
                for t in tl
            ]
        terms_arr, dls = _batch_terms(tok_lists, seed, memo)
        return pa.StructArray.from_arrays(
            [terms_arr, pa.array(np.asarray(dls, dtype=np.int64), type=pa.int32())],
            names=["terms", "dl"],
        )

    return _analyze


def with_doc_terms(df, text_col: str, analyzer_name: str, seed: bytes):
    """Add ``terms`` (sparse doc vector) and ``doc_len`` columns.

    NULL text rows are dropped, matching the reference build's NULL
    skip (src/index/bm25/am/am_build.rs:713-724).
    """
    # asNondeterministic: the analyzer IS deterministic, but marking it
    # so forbids Catalyst from DUPLICATING the expression when two
    # downstream columns derive from the struct — without it the
    # delta-scoring plans carried TWO ArrowEvalPython nodes and
    # tokenized every row twice (caught by the plan guard
    # tests/test_plans.py::test_delta_batch_plan_*)
    udf = doc_terms_udf(analyzer_name, seed).asNondeterministic()
    return (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("_td", udf(F.col(text_col)))
        .withColumn("terms", F.col("_td.terms"))
        .withColumn("doc_len", F.col("_td.dl"))
        .drop("_td")
    )


def explode_mappings(df, doc_id_col: str = "doc_id"):
    """terms array -> exploded mappings rows (term_key, doc_id, tf),
    the reference's ``Mapping`` stream (crates/bm25/src/segment.rs:23-45).
    """
    return df.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col("doc_len"),
        F.explode("terms").alias("t"),
    ).select(
        F.col("t.key").alias("term_key"),
        "doc_id",
        F.col("t.tf").alias("tf"),
        "doc_len",
    )
