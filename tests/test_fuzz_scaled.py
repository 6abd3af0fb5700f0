"""Reference-scale differential fuzz (tests/fuzz:43-59,217-303).

The reference harness: 10,000 initial docs of 100 random tokens from a
10,000-token vocabulary, then a 2 insert : 4 select : 3 delete :
1 vacuum operation mix, each select comparing the indexed path against
the seqscan path on a random 100-token query, LIMIT 100.

This replica keeps the corpus and document shape at reference scale
(10k docs x 100 tokens x 10k vocab) and the same op mix; the iteration
count is CI-budgeted (BM25SPARK_FUZZ_ITERS, default 20 — the reference
runs 5,000 against a long-lived server; one full-scale run is recorded
in COVERAGE.md). The check is *stronger* than the reference's
edit-distance<=10 tolerance: exact (rounded-score, id) rank equality
against a Python oracle that replicates stale-statistics semantics.
"""

from __future__ import annotations

import os
import random
from collections import Counter

import numpy as np
import pytest

from bm25spark.build import build_index
from bm25spark.config import Bm25Config
from bm25spark.fieldnorm import length_to_fieldnorm
from bm25spark.maintain import delete, insert, search_with_delta, vacuum
from bm25spark.scoring import Cache

INIT_DOCUMENTS = 10_000  # reference tests/fuzz:43
DOCUMENT_MAX_TOKEN = 10_000  # reference tests/fuzz:44
DOCUMENT_LEN = 100  # reference tests/fuzz:45
OPS = ["insert"] * 2 + ["select"] * 4 + ["delete"] * 3 + ["vacuum"]
ITERS = int(os.environ.get("BM25SPARK_FUZZ_ITERS", "20"))
K = 100  # reference LIMIT 100 (tests/fuzz:239)


def _tokens(rnd) -> list[str]:
    return [f"t{rnd.randrange(DOCUMENT_MAX_TOKEN)}" for _ in range(DOCUMENT_LEN)]


class FastOracle:
    """Posting-list Python oracle with the reference's stale-statistics
    semantics: N/avgdl/df from the sealed segment only (tombstoned docs
    still counted), delta docs scored against the sealed dictionary."""

    def __init__(self, rows):
        self.sealed_dl: dict[int, int] = {}
        self.post: dict[str, dict[int, int]] = {}
        self.texts: dict[int, Counter] = {}
        for i, toks in rows:
            self._add_sealed(i, Counter(toks))
        self.tomb: set[int] = set()
        self.delta: dict[int, Counter] = {}

    def _add_sealed(self, i, counts):
        self.texts[i] = counts
        self.sealed_dl[i] = sum(counts.values())
        for t, c in counts.items():
            self.post.setdefault(t, {})[i] = c

    def insert(self, i, toks):
        self.delta[i] = Counter(toks)

    def delete(self, i):
        if i in self.sealed_dl:
            self.tomb.add(i)
        self.delta.pop(i, None)

    def vacuum(self):
        for i in self.tomb:
            for t in self.texts[i]:
                self.post[t].pop(i, None)
            del self.texts[i], self.sealed_dl[i]
        self.tomb = set()
        for i, counts in self.delta.items():
            self._add_sealed(i, counts)
        self.delta = {}

    def search(self, qtokens, k, k1=1.2, b=0.75):
        n = len(self.sealed_dl)
        if not n:
            return []
        avgdl = sum(self.sealed_dl.values()) / n
        scores: dict[int, float] = {}
        for t in sorted(set(qtokens)):
            plist = self.post.get(t)
            if not plist:
                continue  # absent from sealed dictionary -> no idf
            cache = Cache(n, len(plist), k1, b, avgdl)
            for i, tf in plist.items():
                if i in self.tomb:
                    continue
                fn = int(length_to_fieldnorm(self.sealed_dl[i]))
                scores[i] = scores.get(i, 0.0) + float(cache.evaluate(fn, tf))
            for i, counts in self.delta.items():
                tf = counts.get(t)
                if tf:
                    fn = int(length_to_fieldnorm(sum(counts.values())))
                    scores[i] = scores.get(i, 0.0) + float(
                        cache.evaluate(fn, tf)
                    )
        hits = [(i, s) for i, s in scores.items() if s > 0.0]
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]


def canon(hits, nd=9):
    return sorted(((round(s, nd), i) for i, s in hits), key=lambda t: (-t[0], t[1]))


@pytest.mark.slow
def test_fuzz_reference_scale(spark, tmp_path):
    rnd = random.Random(20260816)
    rows = [(i, _tokens(rnd)) for i in range(INIT_DOCUMENTS)]
    d = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in rows], "doc_id INT, text STRING"
    )
    build_index(
        spark, df, d, "text", ["doc_id"], cfg=Bm25Config(shard_size=2048)
    )
    oracle = FastOracle(rows)

    def check(q):
        got = search_with_delta(spark, d, " ".join(q), K, "text")
        got_ids = [(p[0], s) for p, s in got]
        want = oracle.search(q, K)
        assert canon(got_ids) == canon(want), (
            len(got_ids), len(want), got_ids[:3], want[:3]
        )

    next_id = 1_000_000
    live = list(range(INIT_DOCUMENTS))
    n_checked = 0
    for it in range(ITERS):
        op = rnd.choice(OPS)
        if op == "insert":
            toks = _tokens(rnd)
            insert(
                spark,
                d,
                spark.createDataFrame(
                    [(next_id, " ".join(toks))], "doc_id INT, text STRING"
                ),
                "text",
            )
            oracle.insert(next_id, toks)
            live.append(next_id)
            next_id += 1
        elif op == "delete":
            # reference picks a random *initial* id — may already be gone
            i = rnd.randrange(1, INIT_DOCUMENTS)
            delete(spark, d, spark.createDataFrame([(i,)], "doc_id INT"))
            oracle.delete(i)
        elif op == "select":
            check(_tokens(rnd))  # 100-term query, like the reference
            n_checked += 1
        elif op == "vacuum":
            vacuum(spark, d, "text")
            oracle.vacuum()
    # final vacuum + verify, as the reference harness ends
    vacuum(spark, d, "text")
    oracle.vacuum()
    check(_tokens(rnd))
    assert n_checked >= 1
