"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema = the north-star input (repo, path, commit, lang, content).
Content is a function of the row id only (numpy Philox streams seeded
per row), so the corpus is identical at any parallelism or partition
layout. Vocabulary is Zipf-distributed (~10k terms) so head terms are
heavily skewed — exercising the build's shard-salting — and content
mixes identifiers (camelCase/snake_case), keywords, and numbers.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EXTS = ["py", "rs", "c", "md"]
_LANGS = {"py": "python", "rs": "rust", "c": "c", "md": "markdown"}

_KEYWORDS = (
    "def class return import fn let mut pub struct impl if else for while "
    "match void int static const include switch case break continue"
).split()
_STEMS = (
    "parse build merge index token score query shard block pack cursor "
    "heap seek flush read write open close init free alloc map list set "
    "vec node tree hash sort scan filter join group agg plan exec task"
).split()


def _vocab(size: int) -> list[str]:
    out = list(_KEYWORDS)
    i = 0
    while len(out) < size:
        a = _STEMS[i % len(_STEMS)]
        b = _STEMS[(i * 7 + 3) % len(_STEMS)]
        style = i % 3
        if style == 0:
            out.append(f"{a}_{b}_{i}")
        elif style == 1:
            out.append(f"{a}{b.capitalize()}{i}")
        else:
            out.append(f"{a}{i}")
        i += 1
    return out[:size]


def synth_corpus(
    spark: SparkSession,
    n: int,
    vocab_size: int = 10000,
    seed: int = 42,
    partitions: int | None = None,
    log_mu: float = 4.2,
) -> DataFrame:
    """n rows of (repo, path, commit, lang, content), deterministic."""
    vocab = np.array(_vocab(vocab_size))
    # Zipf ranks: p(r) ~ 1/(r+1); sampled via inverse-CDF on uniforms
    harmonics = np.cumsum(1.0 / np.arange(1, vocab_size + 1))
    cdf = harmonics / harmonics[-1]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.Generator(np.random.Philox(key=seed, counter=int(i)))
                length = int(np.clip(rng.lognormal(log_mu, 1.0), 10, 5000))
                ranks = np.searchsorted(cdf, rng.random(length))
                toks = vocab[np.clip(ranks, 0, vocab_size - 1)]
                nums = rng.integers(0, 10000, size=max(1, length // 20))
                content = " ".join(toks) + " " + " ".join(map(str, nums))
                ext = _EXTS[int(i) % len(_EXTS)]
                rows.append(
                    (
                        f"org{int(i) % 7}/repo{int(i) % 53}",
                        f"src/m{int(i) // 100}/f{int(i)}.{ext}",
                        "%040x" % int(rng.integers(0, 1 << 63)),
                        _LANGS[ext],
                        content,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    base = spark.range(n, numPartitions=partitions)
    return base.mapInPandas(
        gen, "repo STRING, path STRING, commit STRING, lang STRING, content STRING"
    )


#: Micro-corpus for the ``unicode`` (CJK-bigram) analyzer gate entry.
#: Every whitespace-separated word is single-script (pure CJK or pure
#: latin) so the DuckDB oracle's word-level bigram expansion
#: (oracle._unicode_tok_cte) is exactly equivalent to
#: analyze.tokenize_unicode; no NFKC-sensitive characters.
CJK_PASSAGES: list[tuple[int, str]] = [
    (0, "全文検索エンジンを構築する"),
    (1, "分散処理で全文検索を高速化する設計"),
    (2, "machine learning データ パイプライン"),
    (3, "검색 엔진 최적화 기법"),
    (4, "中文信息检索系统"),
    (5, "全文検索と分散処理の比較"),
    (6, "spark による大規模データ処理"),
    (7, "検索 とは 情報 を 探す こと"),
]


#: WordPiece gate vocabulary: every [a-z0-9] char EXCEPT q and z as
#: both word-initial and continuation pieces (so any q/z-bearing word
#: collapses to [unk] — exercising the UNK path on real corpus data),
#: plus whole-word and suffix pieces that force genuine multi-piece
#: segmentations ("window" -> win ##dow). Shared verbatim by the
#: Spark gate entry and its DuckDB oracle.
_WP_CHARS = "abcdefghijklmnoprstuvwxy0123456789"
WORDPIECE_GATE_VOCAB: list[str] = (
    list(_WP_CHARS)
    + ["##" + c for c in _WP_CHARS]
    + ["merge", "spark", "scan", "join", "batch", "win",
       "##dow", "##ing", "##er", "##ed", "##ream"]
)
