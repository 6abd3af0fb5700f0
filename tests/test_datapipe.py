"""Training-data pipeline operator tests: DuckDB oracle equivalence
for the deterministic ops, recall for the approximate ANN, and the
multimodal Arrow plumbing."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from bm25spark.datapipe import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def duck(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return con.execute(sql).fetchall()


def assert_matches(df, sql):
    got = sorted(map(repr, (tuple(r) for r in df.collect())))
    want = sorted(map(repr, (tuple(r) for r in duck(sql))))
    assert got == want, f"{len(got)} vs {len(want)}: {got[:2]} | {want[:2]}"


class TestDedup:
    def test_exact_groups(self, docs):
        assert_matches(dedup.exact_dup_groups(docs), dedup.exact_dup_groups_sql())

    def test_exact_detects_planted_dup(self, spark):
        rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        out = {
            r.content_hash: (r.n_dups, r.keeper_id)
            for r in dedup.exact_dup_groups(df).collect()
        }
        assert (2, 1) in out.values() and (1, 3) in out.values()

    def test_minhash_signatures(self, docs):
        assert_matches(
            dedup.minhash_signatures(docs), dedup.minhash_signatures_sql()
        )

    def test_minhash_pairs(self, docs):
        assert_matches(
            dedup.minhash_candidate_pairs(docs), dedup.minhash_candidate_pairs_sql()
        )

    def test_minhash_finds_near_dup(self, spark):
        base = " ".join(f"w{i}" for i in range(60))
        near = " ".join(f"w{i}" for i in range(59)) + " zz"
        rows = [(1, base), (2, near)] + [
            (i, " ".join(f"u{i}_{j}" for j in range(60))) for i in range(3, 40)
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        pairs = dedup.minhash_candidate_pairs(df).collect()
        assert any(r.doc_a == 1 and r.doc_b == 2 and r.est_jaccard > 0.5 for r in pairs)

    def test_minhash_components_are_independent(self, spark):
        """Regression for the degenerate affine construction (all 8
        components were monotone functions of ONE base hash, so any
        two docs sharing just the min-hash shingle got identical
        signatures and est_jaccard 1.0): for a planted pair with
        ~50% shingle overlap, the number of equal components must be
        strictly between 0 and 8 and the estimate must be closer to
        0.5 than to either extreme."""
        w = [f"w{i}" for i in range(96)]
        rows = [(1, " ".join(w[:64])), (2, " ".join(w[32:96]))]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        s = {r.doc_id: [r[f"sig{j}"] for j in range(8)]
             for r in dedup.minhash_signatures(df).collect()}
        eq = sum(1 for a, b in zip(s[1], s[2]) if a == b)
        # true shingle jaccard = 30/(62+62-30) ~ 0.32
        assert 0 < eq < 8, s
        assert eq / 8 <= 0.75

    def test_components_match_oracle(self, docs):
        assert_matches(dedup.dedup_components(docs), dedup.dedup_components_sql())

    def test_long_chain_converges_logarithmically(self, spark):
        """A diameter-255 path graph converges within the default 20
        rounds — large-star/small-star is O(log n) rounds; the
        min-label propagation it replaced needed diameter rounds and
        raised here. Also a shuffled-id chain, so convergence doesn't
        depend on ids increasing along the path."""
        n = 256
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a INT, doc_b INT"
        )
        got = dedup.connected_components(pairs, "doc_a", "doc_b").collect()
        assert len(got) == n
        assert all(r.component_id == 0 for r in got)
        perm = [(i * 167) % 1009 for i in range(1009)]
        pairs2 = spark.createDataFrame(
            list(zip(perm, perm[1:])), "doc_a INT, doc_b INT"
        )
        got2 = dedup.connected_components(pairs2, "doc_a", "doc_b").collect()
        assert len(got2) == 1009
        assert all(r.component_id == 0 for r in got2)

    def test_components_equal_union_find(self, spark, docs):
        """The Spark label propagation must produce exactly the
        transitive closure of the candidate-pair graph: compare
        against a driver-side union-find over the same pairs (chain
        corpus planted so multi-hop merges actually occur)."""
        words = [f"w{i}" for i in range(200)]
        planted = [
            (10000 + i, " ".join(words[12 * i: 12 * i + 60])) for i in range(8)
        ]
        existing = [
            (int(r["doc_id"]), r["text"]) for r in docs.limit(60).collect()
        ]
        df = spark.createDataFrame(
            planted + existing, "doc_id INT, text STRING"
        )
        pairs = [
            (r.doc_a, r.doc_b)
            for r in dedup.minhash_candidate_pairs(df).collect()
        ]
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in parent}
        got = {
            r.doc_id: r.component_id
            for r in dedup.dedup_components(df).collect()
        }
        assert got == want
        # multi-hop merge actually exercised: some doc's component id
        # is not one of its direct pair partners
        pair_set = {(a, b) for a, b in pairs}
        assert any(
            cid != d and (min(d, cid), max(d, cid)) not in pair_set
            for d, cid in got.items()
        )

    def test_simhash(self, docs):
        assert_matches(dedup.simhash(docs), dedup.simhash_sql())

    def test_substring_spans_match_oracle(self, docs):
        assert_matches(
            dedup.substring_dup_spans(docs), dedup.substring_dup_spans_sql()
        )

    def test_substring_spans_semantics(self, spark):
        """A 60-char string planted verbatim in two docs at different
        offsets is recovered as exactly that span in each (windows
        straddling the boundary are unique, so the merged range is the
        shared text and nothing more); a shared run shorter than k is
        invisible; a doc with no cross-doc repeat emits no rows."""
        s = "".join(chr(ord("A") + (i * 7) % 26) for i in range(60))
        short = "zYxWvUtSrQpOnMlKjIhGfEdCbA0123456789"  # 36 < k=40
        rows = [
            (1, "aaaa0" * 8 + s + "bbbb1" * 8),      # S at 41..100
            (2, "cccc2" * 4 + s + short + "dddd3"),  # S at 21..80
            (3, "eeee4" * 6 + short + "ffff5" * 6),  # short only
            (4, "unique text " * 10),
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_len)
            for r in dedup.substring_dup_spans(df, k=40).collect()
        }
        assert got == {(1, 41, 100, 60), (2, 21, 80, 60)}

    def test_substring_spans_merge_adjacent(self, spark):
        """Two duplicated runs separated by exactly nothing (adjacent
        anchor windows) merge into one span; runs separated by a
        unique gap longer than k stay separate spans."""
        a = "".join(chr(ord("a") + (i * 11) % 26) for i in range(50))
        b = "".join(chr(ord("A") + (i * 5) % 26) for i in range(50))
        gap = "0123456789!@#$%^&*()" * 5  # 100 unique-ish chars
        rows = [
            (1, a + b + "x" * 7),          # a+b contiguous: one span
            (2, a + gap + b),              # a and b split by the gap
            (3, "filler" + a + "tail, also " + b + "end padding!"),
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = sorted(
            (r.doc_id, r.span_start, r.span_len)
            for r in dedup.substring_dup_spans(df, k=40).collect()
        )
        by_doc = {}
        for d, st, ln in got:
            by_doc.setdefault(d, []).append((st, ln))
        assert by_doc[1] == [(1, 100)]          # merged a+b
        assert len(by_doc[2]) == 2              # split by the gap
        assert [ln for _, ln in by_doc[2]] == [50, 50]

    def test_substring_spans_non_ascii(self, spark):
        """The r7 byte-slice fast path only applies to all-ASCII docs;
        non-ASCII docs take the char-substring fallback. CHAR positions
        (not byte offsets) must come out of both paths, and a gram
        shared between an ASCII and a non-ASCII doc must still group
        (both paths hash the gram's UTF-8 bytes)."""
        s = "".join(chr(ord("A") + (i * 7) % 26) for i in range(60))
        rows = [
            (1, "é" * 10 + s + "ü" * 10),        # non-ASCII, S at 11..70
            (2, "abcd" * 5 + s + "wxyz" * 5),    # ASCII, S at 21..80
            (3, "日本語のテキスト" * 12),           # non-ASCII, no repeat
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {
            (r.doc_id, r.span_start, r.span_end, r.span_len)
            for r in dedup.substring_dup_spans(df, k=40).collect()
        }
        assert got == {(1, 11, 70, 60), (2, 21, 80, 60)}

    def test_keep_canonical_match_oracle(self, docs):
        assert_matches(
            dedup.dedup_keep_canonical(docs), dedup.dedup_keep_canonical_sql()
        )

    def test_keep_canonical_semantics(self, spark):
        """Near-dup cluster keeps exactly its min doc_id; singletons
        keep themselves; every input doc appears exactly once."""
        base = " ".join(f"w{i}" for i in range(60))
        near = " ".join(f"w{i}" for i in range(59)) + " zz"
        rows = [(5, base), (9, near), (1, "solo " * 30)]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {
            r.doc_id: (r.canonical_id, r.keep)
            for r in dedup.dedup_keep_canonical(df).collect()
        }
        assert got == {5: (5, True), 9: (5, False), 1: (1, True)}

    def test_ngram_jaccard(self, docs):
        assert_matches(
            dedup.ngram_jaccard_pairs(docs), dedup.ngram_jaccard_pairs_sql()
        )


class TestBpeTrain:
    def test_matches_independent_reference(self, spark, docs):
        """The distributed trainer and the dict-based reference must
        learn the identical merge sequence (ranks, pairs, freqs) —
        this is the same differential the oracle gate runs."""
        from bm25spark.datapipe import bpe

        got = [
            tuple(r)
            for r in bpe.bpe_train(
                docs, n_merges=12, driver_max_words=0
            ).collect()
        ]
        texts = [r.text for r in docs.select("text").collect()]
        assert got == bpe.bpe_reference_train(texts, 12)

    def test_driver_path_matches_distributed(self, spark, docs):
        """The r7 driver fast path (histogram collected once, merge
        loop in-process) must learn the identical merge table the
        distributed per-round path learns."""
        from bm25spark.datapipe import bpe

        fast = [tuple(r) for r in bpe.bpe_train(docs, n_merges=12).collect()]
        dist = [
            tuple(r)
            for r in bpe.bpe_train(
                docs, n_merges=12, driver_max_words=0
            ).collect()
        ]
        assert fast == dist

    def test_matches_oracle_sql(self, docs):
        from bm25spark.datapipe import bpe

        assert_matches(
            bpe.bpe_train(docs, n_merges=6),
            bpe.bpe_train_sql(n_merges=6, sf_dir=SF),
        )

    def test_known_corpus(self, spark):
        """Hand-checkable corpus: 'aa' dominates, so merge 1 fuses
        (a,a) and merge 2 attaches </w>; greedy left-to-right
        non-overlap means 'aaa' contributes ONE (aa,a) pair after
        merge 1, not two."""
        from bm25spark.datapipe import bpe

        rows = [(1, "aa aa aa aaa"), (2, "aa aa b")]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = [tuple(r) for r in bpe.bpe_train(df, n_merges=3).collect()]
        # round 1 over the word histogram {aa:5, aaa:1, b:1}:
        # 'aa</w>' has one (a,a) slot x5, 'aaa</w>' has two -> (a,a)=7;
        # (a,</w>) = 5+1 = 6 -> merge (a,a) at freq 7
        assert got[0] == (1, "a", "a", "aa", 7)
        # round 2: 'aa</w>' x5 gives (aa,</w>) 5; 'aaa' -> [aa, a,
        # </w>] gives (aa,a) 1, (a,</w>) 1; 'b</w>' 1 -> merge
        # (aa,</w>) freq 5
        assert got[1] == (2, "aa", "</w>", "aa</w>", 5)
        texts = [t for _, t in rows]
        assert got == bpe.bpe_reference_train(texts, 3)

    def test_merge_exhaustion_stops_early(self, spark):
        """A corpus whose words fully fuse runs out of pairs: the
        trainer returns fewer than n_merges rows instead of looping."""
        from bm25spark.datapipe import bpe

        df = spark.createDataFrame([(1, "ab ab ab")], "doc_id INT, text STRING")
        got = bpe.bpe_train(df, n_merges=10).collect()
        # 'ab</w>': (a,b) -> 'ab', (ab,</w>) -> 'ab</w>' -> no pairs
        assert len(got) == 2
        assert [r.merged for r in got] == ["ab", "ab</w>"]


class TestNewOpsDifferentialFuzz:
    """Seeded random-corpus differentials for the round-6 operators:
    the Spark pipeline vs an independent pure-Python brute force on
    adversarial small corpora (tiny alphabet so repeats/merges/shared
    substrings actually occur; empty/short/whitespace edge docs)."""

    def _corpus(self, rng, n_docs):
        docs = []
        for i in range(n_docs):
            kind = rng.integers(0, 5)
            if kind == 0:
                t = ""
            elif kind == 1:
                t = "x" * int(rng.integers(1, 6))
            else:
                words = [
                    "".join(
                        chr(ord("a") + c)
                        for c in rng.integers(0, 3, rng.integers(1, 5))
                    )
                    for _ in range(int(rng.integers(1, 30)))
                ]
                t = " ".join(words)
            docs.append((i, t))
        # plant verbatim shared tails so substring spans fire
        if n_docs >= 4 and docs[0][1] and len(docs[0][1]) > 45:
            docs[1] = (1, docs[1][1] + " " + docs[0][1][:45])
        return docs

    def test_substring_spans_vs_bruteforce(self, spark):
        from bm25spark.datapipe import dedup

        k = 8  # small k so random repeats occur
        rng = np.random.default_rng(11)
        for _ in range(4):
            rows = self._corpus(rng, int(rng.integers(4, 12)))
            df = spark.createDataFrame(rows, "doc_id INT, text STRING")
            got = sorted(
                tuple(r) for r in dedup.substring_dup_spans(df, k=k).collect()
            )
            # brute force: duplicated = k-gram text in >=2 distinct docs
            from collections import defaultdict

            where = defaultdict(set)
            for d, t in rows:
                for p in range(len(t) - k + 1):
                    where[t[p : p + k]].add(d)
            dup = {g for g, ds in where.items() if len(ds) >= 2}
            want = []
            for d, t in rows:
                ps = [
                    p + 1
                    for p in range(len(t) - k + 1)
                    if t[p : p + k] in dup
                ]
                spans = []
                for p in ps:
                    if spans and p - spans[-1][1] <= k:
                        spans[-1][1] = p
                    else:
                        spans.append([p, p])
                want += [
                    (d, a, b + k - 1, b + k - 1 - a + 1) for a, b in spans
                ]
            assert got == sorted(want)

    def test_bpe_vs_reference_on_random_corpora(self, spark):
        from bm25spark.datapipe import bpe

        rng = np.random.default_rng(23)
        for _ in range(3):
            rows = self._corpus(rng, int(rng.integers(3, 10)))
            df = spark.createDataFrame(rows, "doc_id INT, text STRING")
            got = [
                tuple(r)
                for r in bpe.bpe_train(
                    df, n_merges=10, driver_max_words=0
                ).collect()
            ]
            want = bpe.bpe_reference_train([t for _, t in rows], 10)
            assert got == want

    def test_lm_perplexity_vs_bruteforce(self, spark):
        import math
        from collections import Counter

        from bm25spark.datapipe import lm
        from bm25spark.datapipe.tokenize import words_py

        rng = np.random.default_rng(31)
        rows = self._corpus(rng, 10)
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
               for r in lm.lm_perplexity(df).collect()}
        toks = {d: words_py(t) for d, t in rows}
        bc: Counter = Counter()
        for ts in toks.values():
            for a, b in zip(ts, ts[1:]):
                bc[(a, b)] += 1
        hc: Counter = Counter()
        for (a, _), c in bc.items():
            hc[a] += c
        v = len({w for ts in toks.values() for w in ts})
        for d, ts in toks.items():
            pairs = list(zip(ts, ts[1:]))
            if not pairs:
                assert got[d] == (0, None, None)
                continue
            s = sum(
                math.log((bc[p] + 1) / (hc[p[0]] + v)) for p in pairs
            )
            nll = round(-s / len(pairs), 4)
            assert got[d][0] == len(pairs)
            assert abs(got[d][1] - nll) < 1e-9
            assert abs(got[d][2] - round(math.exp(-s / len(pairs)), 4)) < 1e-9


class TestLmPerplexity:
    def test_matches_oracle(self, docs):
        from bm25spark.datapipe import lm

        assert_matches(lm.lm_perplexity(docs), lm.lm_perplexity_sql())

    def test_hand_computed(self, spark):
        """Closed-form check: corpus 'a b', 'a b', 'a c'. V=3.
        c(a,b)=2, c(a,c)=1, c1(a)=3. P(b|a)=(2+1)/(3+3)=1/2,
        P(c|a)=(1+1)/(3+3)=1/3. Doc 1/2: nll=ln2; doc 3: nll=ln3."""
        import math

        from bm25spark.datapipe import lm

        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id INT, text STRING"
        )
        got = {r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
               for r in lm.lm_perplexity(df).collect()}
        assert got[1] == (1, round(math.log(2), 4), 2.0)
        assert got[2] == got[1]
        assert got[3] == (1, round(math.log(3), 4), 3.0)

    def test_short_docs_null(self, spark):
        from bm25spark.datapipe import lm

        df = spark.createDataFrame(
            [(1, "single"), (2, ""), (3, "two tokens here")],
            "doc_id INT, text STRING",
        )
        got = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in
               lm.lm_perplexity(df).collect()}
        assert got[1] == (0, None) and got[2] == (0, None)
        assert got[3][0] == 2 and got[3][1] is not None

    def test_separate_train_corpus_unseen_history(self, spark):
        """Scoring docs against a DIFFERENT training corpus: a bigram
        whose history never occurred in training gets the fully-
        smoothed 1/V mass — finite, not an error."""
        import math

        from bm25spark.datapipe import lm

        train = spark.createDataFrame(
            [(10, "a b"), (11, "a b")], "doc_id INT, text STRING"
        )
        score = spark.createDataFrame(
            [(1, "z q")], "doc_id INT, text STRING"
        )
        got = lm.lm_perplexity(score, train_docs=train).collect()
        # V=2 (train tokens a,b); unseen: (0+1)/(0+2) = 1/2
        assert got[0].avg_nll == round(math.log(2), 4)


class TestSplitAssign:
    def test_matches_oracle(self, docs):
        from bm25spark.datapipe import splits

        assert_matches(splits.split_assign(docs), splits.split_assign_sql())

    def test_deterministic_and_salt_sensitive(self, docs):
        from bm25spark.datapipe import splits

        a = {(r.doc_id, r.split) for r in splits.split_assign(docs).collect()}
        b = {(r.doc_id, r.split) for r in splits.split_assign(docs).collect()}
        assert a == b
        c = {(r.doc_id, r.split) for r in
             splits.split_assign(docs, salt="fold2").collect()}
        assert a != c  # a new salt re-draws the assignment

    def test_weights_validated_and_cover(self, spark, docs):
        import pytest as _pytest

        from bm25spark.datapipe import splits

        with _pytest.raises(ValueError, match="sum to 1"):
            splits.split_assign(docs, weights=(("a", 0.5), ("b", 0.3)))
        with _pytest.raises(ValueError, match="> 0"):
            splits.split_assign(
                docs, weights=(("a", 1.5), ("b", -0.5))
            )
        # a weight below the bucket resolution would be silently
        # unreachable — must refuse, not drop the split
        with _pytest.raises(ValueError, match="unreachable"):
            splits.split_assign(
                docs,
                weights=(("train", 0.999999), ("val", 5e-7), ("test", 5e-7)),
            )
        # every row lands in some split (thresholds cover [0, 1e6))
        got = splits.split_assign(docs).collect()
        assert all(r.split is not None for r in got)
        assert {r.split for r in got} <= {"train", "val", "test"}


class TestTextStats:
    def test_stats(self, docs):
        assert_matches(textstats.text_stats(docs), textstats.text_stats_sql())

    def test_quality(self, docs):
        assert_matches(textstats.text_quality(docs), textstats.text_quality_sql())

    def test_fingerprint(self, docs):
        assert_matches(
            textstats.text_fingerprint(docs), textstats.text_fingerprint_sql()
        )

    def test_pii_flags_match_oracle(self, docs):
        assert_matches(
            textstats.text_pii_flags(docs), textstats.text_pii_flags_sql()
        )

    def test_repetition_matches_oracle(self, docs):
        assert_matches(
            textstats.text_repetition(docs), textstats.text_repetition_sql()
        )

    def test_repetition_planted(self, spark):
        rows = [
            (1, "same line\nsame line\nsame line\nother"),
            (2, "a\nb\nc\nd"),
            (3, "   \n  \n"),  # whitespace only -> zero lines
            (4, "x"),
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {r.doc_id: r for r in textstats.text_repetition(df).collect()}
        assert got[1].n_lines == 4
        assert got[1].dup_line_ratio == pytest.approx(0.5)  # 2 of 4 are repeats
        assert got[1].top_line_frac == pytest.approx(0.75)
        assert got[2].dup_line_ratio == 0.0
        assert got[3].n_lines == 0 and got[3].dup_line_ratio == 0.0
        assert got[4].n_lines == 1 and got[4].top_line_frac == 1.0

    def test_ngram_repetition_matches_oracle(self, docs):
        assert_matches(
            textstats.text_ngram_repetition(docs),
            textstats.text_ngram_repetition_sql(),
        )

    def test_ngram_repetition_planted(self, spark):
        rows = [
            (1, "go go go go"),          # bigrams: 3x "go go"
            (2, "a b c d"),              # 3 distinct bigrams
            (3, "word"),                 # 1 token -> 0 bigrams
            (4, ""),                     # empty
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {
            r.doc_id: r for r in textstats.text_ngram_repetition(df).collect()
        }
        assert got[1].n_bigrams == 3 and got[1].top_bigram_frac == 1.0
        assert got[2].n_bigrams == 3
        assert got[2].top_bigram_frac == pytest.approx(1 / 3, abs=1e-4)
        assert got[3].n_bigrams == 0 and got[3].top_bigram_frac == 0.0
        assert got[4].n_bigrams == 0

    def test_pii_flags_planted(self, spark):
        rows = [
            (1, "contact alice@example.com or bob.smith+x@sub.domain.org"),
            (2, "see https://example.com/a?b=1 and host 10.0.0.1 today"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "clean text with no identifiers at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {r.doc_id: r for r in textstats.text_pii_flags(df).collect()}
        assert got[1].n_emails == 2 and got[1].has_pii
        assert got[2].n_urls == 1 and got[2].n_ipv4 == 1 and got[2].has_pii
        assert got[3].n_phones == 1 and got[3].has_pii
        assert not got[4].has_pii
        assert got[4].n_emails == got[4].n_urls == got[4].n_ipv4 == 0

    def test_fingerprint_collapses_whitespace(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  world"), (2, "hello world"), (3, "other")],
            "doc_id INT, text STRING",
        )
        fps = {r.doc_id: r.fingerprint for r in textstats.text_fingerprint(df).collect()}
        assert fps[1] == fps[2] != fps[3]


class TestSimilarity:
    def test_bruteforce_matches_oracle(self, emb):
        assert_matches(
            similarity.ann_cosine_topk(emb), similarity.ann_cosine_topk_sql()
        )

    def test_lsh_matches_sql_oracle(self, emb):
        """The whole LSH pipeline — integer bucket bits, Hamming-1
        multiprobe, exact-cosine re-rank — is bit-identical to the
        DuckDB oracle (the property that turned the driver-gate row
        from no_oracle into a hash MATCH)."""
        assert_matches(
            similarity.ann_lsh_topk(emb, bits=8, tables=4, multiprobe=1),
            similarity.ann_lsh_topk_sql(dim=64, bits=8, tables=4),
        )

    def _recalls(self, emb, **kw):
        exact = similarity.ann_cosine_topk(emb).collect()
        approx = similarity.ann_lsh_topk(emb, **kw).collect()
        by_e, by_a = {}, {}
        for r in exact:
            by_e.setdefault(r.probe_id, []).append(r.vec_id)
        for r in approx:
            by_a.setdefault(r.probe_id, []).append(r.vec_id)
        # probe itself always lands in its own bucket
        assert all(p in by_a.get(p, []) for p in by_e)
        return [
            len(set(by_a.get(p, [])) & set(want)) / len(want)
            for p, want in by_e.items()
        ]

    def test_lsh_recall_gate(self, spark):
        """Recall@10 bound vs the exact scan on the deterministic
        500-vector corpus (isotropic random data — LSH's worst case;
        measured 0.45 at a 14% candidate scan fraction, i.e. >2x
        better than a random scan of the same size; clustered real
        embeddings fare far better). Fully deterministic: planes,
        quantization and data are all fixed."""
        emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        r4 = self._recalls(emb01, bits=8, tables=4, multiprobe=1)
        assert float(np.mean(r4)) >= 0.35, r4

        # candidate scan fraction stays sublinear-ish and recall beats
        # a random scan of the same fraction by >2x
        planes = similarity.lsh_planes(64, 32)
        pr = emb01.filter(F.col("vec_id").isin(list(range(10)))).collect()
        pm = np.array([r.embedding for r in pr], dtype=np.float64)
        rows = similarity._probe_bucket_rows(
            np.array([r.vec_id for r in pr]),
            similarity._tagged_buckets(pm, planes, 8, 4, 1024),
            8,
            1,
        )
        probe_df = emb01.sparkSession.createDataFrame(
            rows, "probe_id bigint, tb bigint"
        )
        cands = (
            similarity.lsh_tagged_df(emb01, planes, 8, 4)
            .join(F.broadcast(probe_df), "tb")
            .select("probe_id", "vec_id")
            .distinct()
        )
        n = emb01.count()
        fracs = [r["count"] / n for r in cands.groupBy("probe_id").count().collect()]
        frac = float(np.mean(fracs))
        assert frac <= 0.25, fracs
        assert float(np.mean(r4)) > 2 * frac

        # OR-amplification: more tables -> recall must not decrease
        r8 = self._recalls(emb01, bits=8, tables=8, multiprobe=1)
        assert float(np.mean(r8)) >= float(np.mean(r4))

    def test_lsh_clustered_recall_gate(self, spark):
        """Recall gate on *clustered* data — the realistic embedding
        shape (the isotropic gate above is LSH's worst case). Planted:
        40 clusters x 100 points, noise sigma 0.05, probe ids
        interleaved across clusters. Bar: recall@10 >= 0.8 at a <= 5%
        candidate scan fraction. Deterministic end to end (seeded rng,
        integer planes/quantization)."""
        rng = np.random.default_rng(42)
        centers = rng.normal(size=(40, 64))
        pts = (
            centers[:, None, :] + 0.05 * rng.normal(size=(40, 100, 64))
        ).transpose(1, 0, 2).reshape(-1, 64)  # id i -> cluster i % 40
        emb = spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
            "vec_id bigint, embedding array<double>",
        )
        bits, tables, multiprobe = 14, 8, 1
        recalls = self._recalls(emb, bits=bits, tables=tables, multiprobe=multiprobe)
        assert float(np.mean(recalls)) >= 0.8, np.mean(recalls)

        planes = similarity.lsh_planes(64, bits * tables)
        pm = pts[:10]
        rows = similarity._probe_bucket_rows(
            np.arange(10),
            similarity._tagged_buckets(pm, planes, bits, tables, 1024),
            bits,
            multiprobe,
        )
        probe_df = spark.createDataFrame(rows, "probe_id bigint, tb bigint")
        cands = (
            similarity.lsh_tagged_df(emb, planes, bits, tables)
            .join(F.broadcast(probe_df), "tb")
            .select("probe_id", "vec_id")
            .distinct()
        )
        fracs = [
            r["count"] / 4000.0
            for r in cands.groupBy("probe_id").count().collect()
        ]
        assert float(np.mean(fracs)) <= 0.05, fracs

    def test_lsh_bits_scale_with_corpus(self):
        assert similarity.lsh_bits_for(500) == 8
        assert similarity.lsh_bits_for(1_000_000) == 14
        assert similarity.lsh_bits_for(10**9) == 24
        assert similarity.lsh_bits_for(10**12) == 24  # hi clamp

    def test_lsh_indexed_equals_inmemory(self, spark, tmp_path):
        """The persisted bucket-table path (directory-pruned reads)
        returns exactly the in-memory pipeline's rows, and its plan
        prunes partitions on tb."""
        emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        d = str(tmp_path / "lsh_idx")
        meta = similarity.build_lsh_index(emb01, d, bits=8, tables=4)
        assert meta["bits"] == 8 and meta["n"] == 500
        got = similarity.ann_lsh_topk_indexed(spark, d)
        want = similarity.ann_lsh_topk(emb01, bits=8, tables=4, multiprobe=1)
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "tb" in plan

    def test_ivf_indexed_equals_inmemory_and_prunes(self, spark, tmp_path):
        """build_ivf_index + ann_ivf_topk_indexed must equal the
        in-memory ann_ivf_topk (same centroids, same quantization) and
        the serving scan must show cid partition pruning — the
        nprobe/n_clusters scan fraction as real directory-level I/O."""
        emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        d = str(tmp_path / "ivf_idx")
        meta = similarity.build_ivf_index(emb01, d)
        assert meta["n_clusters"] == 16 and meta["n"] == 500
        got = similarity.ann_ivf_topk_indexed(spark, d)
        want = similarity.ann_ivf_topk(emb01)
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "cid" in plan

    def test_ivf_matches_oracle_and_recall(self, spark):
        """IVF: same determinism design as the LSH (trained centroids
        are cross-engine literals; integer-exact assignment), so the
        approximate pipeline hash-matches its oracle; recall@10 and
        nprobe monotonicity gated on the deterministic corpus."""
        import duckdb

        from bm25spark.datapipe import _ivf_oracle_sql

        sf = "/root/testdata/sf0.01"
        emb01 = spark.read.parquet(f"{sf}/embeddings.parquet")
        got = sorted(
            map(repr, (tuple(r) for r in similarity.ann_ivf_topk(emb01).collect()))
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
        )
        want = sorted(
            map(repr, (tuple(r) for r in con.execute(_ivf_oracle_sql(sf)).fetchall()))
        )
        assert got == want and len(got) > 0

        exact = {}
        for r in similarity.ann_cosine_topk(emb01).collect():
            exact.setdefault(r.probe_id, set()).add(r.vec_id)

        def recall(nprobe):
            by = {}
            for r in similarity.ann_ivf_topk(emb01, nprobe=nprobe).collect():
                by.setdefault(r.probe_id, set()).add(r.vec_id)
            return float(
                np.mean([len(by.get(p, set()) & s) / len(s) for p, s in exact.items()])
            )

        r3 = recall(3)
        assert r3 >= 0.3, r3  # nprobe/n_clusters = 3/16 scan fraction
        assert recall(16) == 1.0  # probing every cluster = exact

    def test_ivf_train_matmul_exact_and_bounded(self):
        """The ||q||^2 - 2q.c + ||c||^2 matmul distance must equal the
        naive broadcast tensor bit-for-bit (integer-exact under 2^53),
        and training at the default sample size must never allocate
        the O(sample*k*dim) tensor (~2 GB at 65536x16x256) — peak
        traced memory stays within a few input-sized buffers."""
        import tracemalloc

        from bm25spark.datapipe.similarity import _sq_dists, ivf_train

        rng = np.random.default_rng(7)
        q = rng.integers(-1024, 1024, size=(257, 33)).astype(np.int64)
        c = rng.integers(-1024, 1024, size=(16, 33)).astype(np.int64)
        naive = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assert np.array_equal(_sq_dists(q, c), naive)

        n, d = 65536, 256
        vecs = rng.random((n, d))
        naive_bytes = n * 16 * d * 8  # what the old broadcast form built
        tracemalloc.start()
        cents = ivf_train(vecs, 16, iters=2)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert cents.shape == (16, d)
        assert peak < naive_bytes // 2, f"peak {peak} vs naive {naive_bytes}"

    def test_embedding_components_match_oracle(self, emb):
        assert_matches(
            similarity.embedding_components(emb, bits=8, tables=4),
            similarity.embedding_components_sql(dim=64, bits=8, tables=4),
        )

    def test_embedding_components_cluster_planted(self, spark):
        """Three near-identical planted vectors must land in ONE
        component labeled by the smallest id (pairwise angles tiny, so
        every pair collides in every table and passes the verify)."""
        rng = np.random.default_rng(3)
        base = rng.normal(size=64)
        rows = [(9001 + i, (base + 0.001 * rng.normal(size=64)).tolist())
                for i in range(3)]
        rows += [(i, rng.normal(size=64).tolist()) for i in range(40)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )
        comp = {
            r.vec_id: r.component_id
            for r in similarity.embedding_components(
                emb, bits=8, tables=4
            ).collect()
        }
        assert comp[9001] == comp[9002] == comp[9003] == 9001

    def test_embedding_near_dup_matches_oracle(self, emb):
        assert_matches(
            similarity.embedding_near_dup_pairs(emb, bits=8, tables=4),
            similarity.embedding_near_dup_pairs_sql(dim=64, bits=8, tables=4),
        )

    def test_embedding_near_dup_finds_planted_pair(self, spark):
        """A planted near-identical vector pair must collide in every
        LSH table (tiny angle) and survive the cosine verify."""
        rng = np.random.default_rng(7)
        base = rng.normal(size=(40, 64))
        dup = base[3] + rng.normal(scale=1e-3, size=64)  # ~cos 1.0
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
        rows.append((1000, [float(x) for x in dup]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = similarity.embedding_near_dup_pairs(
            df, threshold=0.9, bits=8, tables=4
        ).collect()
        assert [(r.a, r.b) for r in got] == [(3, 1000)]
        assert got[0].cos > 0.999

    def test_lsh_scores_are_exact_cosine(self, emb):
        exact = {
            (r.probe_id, r.vec_id): r.cos
            for r in similarity.ann_cosine_topk(emb, k=500).collect()
        }
        for r in similarity.ann_lsh_topk(emb).collect():
            assert exact[(r.probe_id, r.vec_id)] == r.cos


class TestMultimodal:
    def test_decode_stub(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG")

    def test_media_schema_and_features(self, spark, docs):
        media = multimodal.attach_fake_media(docs.limit(50))
        assert [(f.name, f.dataType) for f in media.schema.fields] == [
            (f.name, f.dataType) for f in multimodal.MEDIA_SCHEMA.fields
        ]
        feats = multimodal.extract_features(media).collect()
        assert len(feats) == 50
        for r in feats:
            assert r.n_bytes == 64  # 2x sha256 decoded from hex
            assert len(r.histogram16) == 16
            assert abs(sum(r.histogram16) - 1.0) < 1e-6
            assert 0.0 < r.byte_entropy <= 4.0

    def test_features_deterministic(self, spark, docs):
        media = multimodal.attach_fake_media(docs.limit(20))
        a = sorted(map(repr, multimodal.extract_features(media).collect()))
        b = sorted(map(repr, multimodal.extract_features(media).collect()))
        assert a == b

    def test_batch_vectorized_equals_per_row(self, spark, docs):
        """The one-bincount-per-batch vectorization must reproduce the
        per-row formulation exactly (including empty and skewed-length
        blobs)."""
        media = multimodal.attach_fake_media(docs.limit(25))
        got = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
        for row in media.collect():
            arr = np.frombuffer(row.media, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
            p = hist / max(len(arr), 1)
            nz = p[p > 0]
            want_entropy = round(float(-(nz * np.log2(nz)).sum()), 6)
            r = got[row.doc_id]
            assert r.n_bytes == len(arr)
            assert r.byte_entropy == pytest.approx(want_entropy, abs=0)
            assert r.histogram16 == p.round(6).tolist()

    def test_empty_blob_batch(self, spark):
        """Zero-length media must not break the offsets bincount."""
        media = spark.createDataFrame(
            [(1, "image/png", 4, 4, bytearray(b"")),
             (2, "image/png", 4, 4, bytearray(b"\x00\xff\xff"))],
            multimodal.MEDIA_SCHEMA,
        )
        feats = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
        assert feats[1].n_bytes == 0 and feats[1].byte_entropy == 0.0
        assert feats[2].n_bytes == 3
        assert feats[2].histogram16[0] == pytest.approx(1 / 3, abs=1e-6)
        assert feats[2].histogram16[15] == pytest.approx(2 / 3, abs=1e-6)

    def test_frame_sample_plan(self, spark, docs):
        media = multimodal.attach_fake_media(docs.limit(30))
        plan = multimodal.frame_sample_plan(media, every_n=1).collect()
        vids = {r.doc_id for r in media.filter("media_type = 'video/mp4'").collect()}
        assert {r.doc_id for r in plan} == vids
        assert all(r.frame_no == 0 for r in plan)  # 64B media -> 1 frame


class TestSimhashHammingPairs:
    def test_planted_near_dupes_and_oracle(self, spark):
        import duckdb

        from bm25spark.datapipe import dedup

        base = (
            "the quick brown fox jumps over the lazy dog again and again "
            "while the indexing engine builds compressed posting lists"
        )
        rows = [
            (1, base),
            (2, base + " extra"),          # near-dup of 1
            (3, "completely different words about database query planning "
                "optimizer statistics and cost models for joins"),
            (4, base.replace("fox", "cat")),  # near-dup of 1
        ]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        got = {
            (r.doc_a, r.doc_b): r.hamming
            for r in dedup.simhash_hamming_pairs(docs).collect()
        }
        assert (1, 2) in got and got[(1, 2)] <= 3
        assert all(3 not in pair for pair in got)

        con = duckdb.connect()
        con.register("documents_src", __import__("pandas").DataFrame(
            rows, columns=["doc_id", "text"]))
        con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
        orows = con.execute(dedup.simhash_hamming_pairs_sql()).fetchall()
        assert sorted(got.items()) == sorted(
            ((a, b), h) for a, b, h in orows
        )


def test_ann_kernel_rank_identical_to_catalyst(spark):
    from bm25spark.datapipe import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = [tuple(r) for r in similarity.ann_cosine_topk(emb).collect()]
    b = [tuple(r) for r in similarity.ann_cosine_topk_kernel(emb).collect()]
    assert a == b


class TestDedupCacheHygiene:
    def test_no_cache_growth_across_dedup_calls(self, spark, docs):
        """Sequential dedup pipelines must not accumulate persisted
        frames (VERDICT r3 #2): each call's subplan persist is tracked
        and drained by the next call; release_caches drains explicitly
        — same pattern as bm25spark.query."""

        def n_persisted() -> int:
            return len(
                spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
            )

        dedup.release_caches()
        base = n_persisted()
        for _ in range(3):
            dedup.minhash_candidate_pairs(docs).collect()
            assert n_persisted() <= base + 1
            dedup.simhash_hamming_pairs(docs).collect()
            assert n_persisted() <= base + 1
            dedup.ngram_jaccard_pairs(docs).collect()
            assert n_persisted() <= base + 1
        dedup.release_caches()
        assert n_persisted() <= base


class TestIvfBuildGuards:
    def test_empty_input_raises(self, spark, tmp_path):
        empty = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<FLOAT>")
        with pytest.raises(ValueError, match="no rows"):
            similarity.build_ivf_index(empty, str(tmp_path / "ivf_empty"))

    def test_float64_input_refused(self, spark, tmp_path):
        """The clusters artifact is array<float>; a float64 source would
        be silently truncated, breaking the indexed==in-memory claim —
        refuse it."""
        df = spark.createDataFrame(
            [(0, [0.1, 0.2]), (1, [0.3, 0.4])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
        )
        with pytest.raises(ValueError, match="float32"):
            similarity.build_ivf_index(df, str(tmp_path / "ivf_f64"))


class TestAudioReal:
    """REAL WAV decode (stdlib wave + NumPy) — VERDICT r3 #3."""

    def test_roundtrip_known_values(self):
        """Container write -> parse roundtrip on a hand-checkable PCM."""
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(4000)
            w.writeframes(
                np.array([0, 100, -100, 50, -1], dtype="<i2").tobytes()
            )
        f = multimodal.decode_audio(buf.getvalue())
        assert f == {
            "sample_rate": 4000,
            "n_channels": 1,
            "n_frames": 5,
            "duration_ms": 1,
            "energy": 0 + 100**2 + 100**2 + 50**2 + 1,
            # sign changes: 0>=0, 100>=0, -100<0, 50>=0, -1<0 -> 3
            "zero_crossings": 3,
        }

    def test_stereo_averaged(self):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            # frames: (10, 30), (-20, -40) -> mono 20, -30
            w.writeframes(np.array([10, 30, -20, -40], dtype="<i2").tobytes())
        f = multimodal.decode_audio(buf.getvalue())
        assert f["n_channels"] == 2 and f["n_frames"] == 2
        assert f["energy"] == 20**2 + 30**2
        assert f["zero_crossings"] == 1

    def test_rejects_8bit(self):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(b"\x00\x10\x20")
        with pytest.raises(ValueError, match="16-bit"):
            multimodal.decode_audio(buf.getvalue())

    def test_pipeline_matches_oracle(self, spark, docs):
        assert_matches(
            multimodal.audio_features(
                multimodal.synthesize_wav_media(docs)
            ).orderBy("doc_id"),
            multimodal.audio_wav_features_sql(),
        )

    def test_synthesized_container_is_valid_riff(self):
        b = multimodal.synthesize_wav(42)
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/testdata/sf0.1"),
    reason="sf0.1 testdata not present",
)
def test_ivf_matches_oracle_at_sf01(spark):
    """Stretch gate (VERDICT r3 #8): the IVF entry verified at sf0.1
    through the same env-threaded oracle path the driver gate uses
    (BM25SPARK_GATE_SF_DIR reaches _ivf_oracle_sql, so oracle centroids
    train on the same rows as the Spark entry)."""
    import os

    from bm25spark.datapipe import _ivf_oracle_sql

    sf = "/root/testdata/sf0.1"
    old = os.environ.get("BM25SPARK_GATE_SF_DIR")
    os.environ["BM25SPARK_GATE_SF_DIR"] = sf
    try:
        emb01 = spark.read.parquet(f"{sf}/embeddings.parquet")
        got = sorted(
            map(repr, (tuple(r) for r in similarity.ann_ivf_topk(emb01).collect()))
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
        )
        want = sorted(map(repr, con.execute(_ivf_oracle_sql()).fetchall()))
        assert got == want
    finally:
        if old is None:
            os.environ.pop("BM25SPARK_GATE_SF_DIR", None)
        else:
            os.environ["BM25SPARK_GATE_SF_DIR"] = old


class TestQualityFilter:
    def test_matches_oracle(self, docs):
        assert_matches(
            textstats.corpus_quality_filter(docs),
            textstats.corpus_quality_filter_sql(),
        )

    def test_planted_rule_hits(self, spark):
        """Each filter rule fires on a doc engineered to trip exactly
        it (plus whatever co-fires honestly), and a clean doc keeps."""
        rows = [
            (1, "the quick brown fox jumps over the lazy dog and runs on"),
            (2, "word"),                                  # too_short
            (3, "1234 5678 9012 3456 to be " + "a " * 10),  # digit_heavy
            (4, "alpha beta gamma delta epsilon zeta eta theta"),  # no_stopwords
            (5, "the line is here\n" * 10),               # dup_lines (+boilerplate)
            (6, "the cat " * 40),                         # boilerplate
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        out = {r.doc_id: r for r in textstats.corpus_quality_filter(df).collect()}
        assert out[1].keep and out[1].reasons == ""
        assert not out[2].keep and "too_short" in out[2].reasons
        assert not out[3].keep and "digit_heavy" in out[3].reasons
        assert not out[4].keep and "no_stopwords" in out[4].reasons
        assert not out[5].keep and "dup_lines" in out[5].reasons
        assert not out[6].keep and "boilerplate" in out[6].reasons


class TestImageReal:
    """REAL BMP decode (struct + NumPy) — VERDICT r4 missing #5."""

    def test_roundtrip_pixels_exact(self):
        import numpy as np

        from bm25spark.datapipe import multimodal

        for doc_id in (0, 7, 12, 101, 9999):
            w, h = multimodal.bmp_dims(doc_id)
            px = multimodal.decode_image(multimodal.synthesize_bmp(doc_id))
            assert px.shape == (h, w, 3)
            want = multimodal._bmp_pixels(doc_id, w, h)
            assert np.array_equal(px, want), doc_id

    def test_row_padding_and_topdown(self):
        """Hand-built BMPs: a width-3 image (9-byte rows padded to 12)
        bottom-up AND top-down must decode to the same image array."""
        import struct

        import numpy as np

        from bm25spark.datapipe import multimodal

        w, h = 3, 2
        img = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
        row_size = (3 * w + 3) // 4 * 4

        def mk(top_down):
            hh = -h if top_down else h
            rows = img if top_down else img[::-1]
            body = np.zeros((h, row_size), dtype=np.uint8)
            body[:, : 3 * w] = rows.reshape(h, 3 * w)
            header = struct.pack("<2sIHHI", b"BM", 54 + row_size * h, 0, 0, 54)
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, hh, 1, 24, 0, row_size * h, 0, 0, 0, 0
            )
            return header + info + body.tobytes()

        assert np.array_equal(multimodal.decode_image(mk(False)), img)
        assert np.array_equal(multimodal.decode_image(mk(True)), img)

    def test_unsupported_variants_fail_loudly(self):
        import pytest as _pytest

        from bm25spark.datapipe import multimodal

        blob = bytearray(multimodal.synthesize_bmp(5))
        blob[28] = 32  # bpp 24 -> 32
        with _pytest.raises(ValueError, match="24-bpp"):
            multimodal.decode_image(bytes(blob))
        blob = bytearray(multimodal.synthesize_bmp(5))
        blob[30] = 1  # BI_RLE8 compression
        with _pytest.raises(ValueError, match="unsupported"):
            multimodal.decode_image(bytes(blob))
        with _pytest.raises(ValueError, match="truncated"):
            multimodal.decode_image(multimodal.synthesize_bmp(5)[:-4])
        # PNG now decodes for real — garbage after a valid signature
        # fails the chunk walk loudly instead of the old stub error
        with _pytest.raises(ValueError, match="PNG"):
            multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"x" * 64)
        # JPEG decodes for real now — garbage after SOI fails the
        # segment walk loudly instead of the old stub error
        with _pytest.raises(ValueError, match="truncated|marker"):
            multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"x" * 64)
        # lossless VP8L decodes for real now; LOSSY VP8 stays stubbed,
        # loudly (a well-formed chunk — a bare tag with no length is a
        # malformed container and fails the chunk walk as ValueError)
        import struct as _struct

        lossy = b"VP8 " + _struct.pack("<I", 10) + b"\x00" * 10
        data = b"RIFF" + _struct.pack("<I", 4 + len(lossy)) + b"WEBP" + lossy
        with _pytest.raises(NotImplementedError, match="VP8L lossless"):
            multimodal.decode_image(data)
        with _pytest.raises(ValueError, match="VP8L chunk"):
            multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")

    def test_spark_features_match_closed_form(self, spark):
        import numpy as np

        from bm25spark.datapipe import multimodal

        docs = spark.createDataFrame(
            [(i,) for i in range(40)], "doc_id LONG"
        )
        got = (
            multimodal.image_features(multimodal.synthesize_bmp_media(docs))
            .orderBy("doc_id")
            .collect()
        )
        assert len(got) == 40
        for r in got:
            w, h = multimodal.bmp_dims(r.doc_id)
            px = multimodal._bmp_pixels(r.doc_id, w, h).astype(np.int64)
            assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
            sums = px.reshape(-1, 3).sum(axis=0)
            assert (r.b_sum, r.g_sum, r.r_sum) == tuple(int(x) for x in sums)


class TestVideoReal:
    """REAL AVI decode (struct + NumPy) — completes the audio/image/
    video triple: one genuinely-decoded uncompressed format each."""

    def test_roundtrip_frames_exact(self):
        import numpy as np

        from bm25spark.datapipe import multimodal

        for doc_id in (0, 7, 12, 101, 9999):
            w, h = multimodal.avi_dims(doc_id)
            n = multimodal.avi_frame_count(doc_id)
            v = multimodal.decode_video(multimodal.synthesize_avi(doc_id))
            assert v["fps"] == multimodal.VID_FPS
            assert v["n_frames"] == n
            assert v["frames"].shape == (n, h, w, 3)
            for f in range(n):
                want = multimodal._avi_pixels(doc_id, f, w, h)
                assert np.array_equal(v["frames"][f], want), (doc_id, f)

    def test_unsupported_variants_fail_loudly(self):
        import struct

        import pytest as _pytest

        from bm25spark.datapipe import multimodal

        good = multimodal.synthesize_avi(5)

        # locate strf payload (BITMAPINFOHEADER) to corrupt bpp/compression
        strf_off = good.index(b"strf") + 8
        blob = bytearray(good)
        struct.pack_into("<H", blob, strf_off + 14, 32)  # bpp 24 -> 32
        with _pytest.raises(ValueError, match="24-bpp"):
            multimodal.decode_video(bytes(blob))
        blob = bytearray(good)
        struct.pack_into("<I", blob, strf_off + 16, 1)  # BI_RLE8
        with _pytest.raises(ValueError, match="compression"):
            multimodal.decode_video(bytes(blob))
        # compressed '00dc' frame chunk
        blob = bytearray(good)
        dc = blob.index(b"00db")
        blob[dc : dc + 4] = b"00dc"
        with _pytest.raises(ValueError, match="compressed"):
            multimodal.decode_video(bytes(blob))
        # strh frame count disagreeing with movi
        strh_off = good.index(b"strh") + 8
        blob = bytearray(good)
        struct.pack_into("<I", blob, strh_off + 32, 99)  # dwLength
        with _pytest.raises(ValueError, match="frame count"):
            multimodal.decode_video(bytes(blob))
        # non-AVI containers remain stubbed, loudly
        with _pytest.raises(NotImplementedError):
            multimodal.decode_video(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64)

    def test_spark_features_and_frame_sample(self, spark):
        import numpy as np

        from bm25spark.datapipe import multimodal

        docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id LONG")
        media = multimodal.synthesize_avi_media(docs)
        got = multimodal.video_features(media).orderBy("doc_id").collect()
        assert len(got) == 30
        for r in got:
            w, h = multimodal.avi_dims(r.doc_id)
            n = multimodal.avi_frame_count(r.doc_id)
            assert (r.width, r.height, r.fps, r.n_frames, r.n_pixels) == (
                w, h, multimodal.VID_FPS, n, n * w * h,
            )
            all_px = np.stack(
                [multimodal._avi_pixels(r.doc_id, f, w, h) for f in range(n)]
            ).astype(np.int64)
            sums = all_px.reshape(-1, 3).sum(axis=0)
            assert (r.b_sum, r.g_sum, r.r_sum) == tuple(int(x) for x in sums)

        sampled = (
            multimodal.frame_sample(media, every_n=2)
            .orderBy("doc_id", "frame_no")
            .collect()
        )
        by_doc = {}
        for r in sampled:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, rows in by_doc.items():
            w, h = multimodal.avi_dims(doc_id)
            n = multimodal.avi_frame_count(doc_id)
            assert [r.frame_no for r in rows] == list(range(0, n, 2))
            for r in rows:
                px = multimodal._avi_pixels(doc_id, r.frame_no, w, h)
                sums = px.astype(np.int64).reshape(-1, 3).sum(axis=0)
                assert (r.b_sum, r.g_sum, r.r_sum) == tuple(
                    int(x) for x in sums
                )

    def test_interleaved_audio_stream_selection(self):
        """Real-world AVI shape: PCM 'auds' stream declared first, so
        video is stream 01 ('01db' chunks) with '00wb' audio chunks
        interleaved — the decoder must route by stream index, not grab
        the first strl or any '..db' chunk."""
        import numpy as np

        from bm25spark.datapipe import multimodal

        for doc_id in (0, 11, 42):
            blob = multimodal.synthesize_avi(doc_id, with_audio=True)
            assert b"auds" in blob and b"01db" in blob and b"00wb" in blob
            v = multimodal.decode_video(blob)
            w, h = multimodal.avi_dims(doc_id)
            n = multimodal.avi_frame_count(doc_id)
            assert v["frames"].shape == (n, h, w, 3)
            for f in range(n):
                want = multimodal._avi_pixels(doc_id, f, w, h)
                assert np.array_equal(v["frames"][f], want), (doc_id, f)

    def test_no_video_stream_fails_loudly(self):
        import pytest as _pytest

        from bm25spark.datapipe import multimodal

        blob = bytearray(multimodal.synthesize_avi(3, with_audio=True))
        i = blob.index(b"vids")
        blob[i : i + 4] = b"xxxx"
        with _pytest.raises(ValueError, match="vids"):
            multimodal.decode_video(bytes(blob))


class TestDecontaminate:
    """Benchmark n-gram decontamination: DuckDB differential on the
    real corpus split, closed-form semantics on a tiny corpus, and the
    broadcast plan shape the 100-TB story depends on."""

    def test_matches_duckdb_oracle(self, spark, docs):
        from pyspark.sql import functions as F

        from bm25spark.datapipe import decontam

        bench = docs.filter(F.col("doc_id") % 97 == 0)
        train = docs.filter(F.col("doc_id") % 97 != 0)
        assert_matches(
            decontam.decontaminate_ngrams(train, bench, n=4),
            decontam.decontaminate_ngrams_sql(n=4, bench_pred="doc_id % 97 = 0"),
        )

    def test_closed_form_semantics(self, spark):
        from bm25spark.datapipe import decontam

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps")], ["doc_id", "text"]
        )
        train = spark.createDataFrame(
            [
                # hit: contains 'quick brown fox' (case/punct-invariant)
                (1, "He said: QUICK, brown fox! runs away"),
                # two distinct hits: both benchmark trigrams appear
                (2, "the quick brown fox jumps again the quick brown"),
                # clean: right words, wrong order
                (3, "fox brown quick the jumps"),
                # too short for any trigram
                (4, "quick brown"),
                # NULL text: dropped entirely
                (5, None),
            ],
            ["doc_id", "text"],
        )
        rows = {
            r["doc_id"]: r
            for r in decontam.decontaminate_ngrams(train, bench, n=3).collect()
        }
        assert set(rows) == {1, 2, 3, 4}
        assert rows[1]["contaminated"] and rows[1]["n_contaminated"] == 1
        assert rows[1]["first_gram"] == "quick brown fox"
        assert rows[2]["n_contaminated"] >= 2
        assert not rows[3]["contaminated"] and rows[3]["first_gram"] is None
        assert not rows[4]["contaminated"]
        # repeated occurrences of ONE gram in a doc count once
        assert rows[2]["first_gram"].startswith("brown fox") or rows[2][
            "first_gram"
        ].startswith("quick brown")

    def test_plan_broadcasts_benchmark_grams(self, spark, docs):
        from pyspark.sql import functions as F

        from bm25spark.datapipe import decontam

        bench = docs.filter(F.col("doc_id") % 97 == 0)
        train = docs.filter(F.col("doc_id") % 97 != 0)
        plan = (
            decontam.decontaminate_ngrams(train, bench, n=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]


class TestPngReal:
    """REAL compressed-image path: genuine PNG containers (zlib
    deflate, CRC'd chunks, filter types 0-4) decoded with stdlib
    inflate + NumPy unfiltering, bit-exact against the closed-form
    pixel generator."""

    def test_roundtrip_bit_exact_all_filters(self):
        import numpy as np

        from bm25spark.datapipe import multimodal as M

        for i in list(range(12)) + [97, 1000, 65535]:
            w, h = M.png_dims(i)
            px = M.decode_image(M.synthesize_png(i))
            assert px.shape == (h, w, 3)
            # h >= 5 -> every filter type 0..4 exercised per image
            assert np.array_equal(px, M._png_pixels(i, w, h)), i

    def test_single_filter_images_roundtrip(self):
        """One image per filter type: re-filter a fixed pixel array
        with ONLY that filter and check the decoder inverts it."""
        import struct
        import zlib

        import numpy as np

        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)

        def build(forced_filter):
            w, h, bpp = 5, 6, 3
            raw = bytearray()
            prev = np.zeros((w, bpp), dtype=np.int64)
            for r in range(h):
                row = px[r].astype(np.int64)
                left = np.vstack(
                    [np.zeros((1, bpp), dtype=np.int64), row[:-1]]
                )
                f = forced_filter
                if f == 0:
                    filt = row
                elif f == 1:
                    filt = row - left
                elif f == 2:
                    filt = row - prev
                elif f == 3:
                    filt = row - (left + prev) // 2
                else:
                    ul = np.vstack(
                        [np.zeros((1, bpp), dtype=np.int64), prev[:-1]]
                    )
                    p_ = left + prev - ul
                    pa = np.abs(p_ - left)
                    pb = np.abs(p_ - prev)
                    pc = np.abs(p_ - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, prev, ul),
                    )
                    filt = row - pred
                raw.append(f)
                raw.extend((filt % 256).astype(np.uint8).tobytes())
                prev = row.copy()

            def chunk(ctype, payload):
                return (
                    struct.pack(">I", len(payload)) + ctype + payload
                    + struct.pack(
                        ">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF
                    )
                )

            return (
                M._PNG_SIG
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b"")
            )

        for f in range(5):
            got = M.decode_image(build(f))
            assert np.array_equal(got, px), f"filter {f}"

    def test_corruption_variants_fail_loudly(self):
        import struct
        import zlib

        import pytest as _pytest

        from bm25spark.datapipe import multimodal as M

        good = M.synthesize_png(3)
        # CRC flip
        b = bytearray(good)
        b[20] ^= 0xFF
        with _pytest.raises(ValueError, match="CRC"):
            M.decode_image(bytes(b))
        # unsupported color type (palette): rebuild IHDR with valid
        # CRC (gray/RGB/RGBA all decode now; type 3 needs a PLTE)
        w, h = M.png_dims(3)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        bad = (
            M._PNG_SIG
            + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        with _pytest.raises(ValueError, match="unsupported PNG"):
            M.decode_image(bad + good[8 + 25:])
        # missing IEND
        with _pytest.raises(ValueError, match="IHDR/IEND"):
            M.decode_image(good[:-12])
        # short scanline payload (valid zlib of wrong length)
        pre, idat_off = good[: 8 + 25], 8 + 25
        (ln,) = struct.unpack_from(">I", good, idat_off)
        tail = good[idat_off + 12 + ln:]
        short = zlib.compress(b"\x00" * 7)
        ch = struct.pack(">I", len(short)) + b"IDAT" + short + struct.pack(
            ">I", zlib.crc32(b"IDAT" + short) & 0xFFFFFFFF
        )
        with _pytest.raises(ValueError, match="scanline"):
            M.decode_image(pre + ch + tail)

    def test_spark_features_match_oracle(self, spark, docs):
        from bm25spark.datapipe import multimodal as M

        assert_matches(
            M.png_features(M.synthesize_png_media(docs)).orderBy("doc_id"),
            M.image_png_features_sql(),
        )


class TestJpeg:
    """Baseline JFIF: constant-block integer exactness, differential
    fuzz of Huffman+zigzag+dequant+IDCT against an independent
    loop-form T.81 IDCT, YCbCr conversion, honest refusals, and the
    Spark feature path vs the closed-form oracle."""

    @staticmethod
    def _ref_idct(S):
        import math

        out = np.zeros((8, 8))
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * S[u, v]
                            * math.cos((2 * y + 1) * u * math.pi / 16)
                            * math.cos((2 * x + 1) * v * math.pi / 16)
                        )
                out[y, x] = s / 4
        return out

    def test_constant_block_roundtrip_exact(self):
        from bm25spark.datapipe import multimodal as M

        for d in (0, 1, 7, 42, 997, 12345):
            w, h = M.jpeg_dims(d)
            px = M.decode_image(M.synthesize_jpeg(d))
            assert px.shape == (h, w, 1)
            nbx = -(-w // 8)
            p = np.arange(h * w, dtype=np.int64)
            bi = (p // w) // 8 * nbx + (p % w) // 8
            want = ((d * M.IMG_MIX_A + bi * M.IMG_MIX_B) % 256).reshape(h, w)
            assert np.array_equal(px[:, :, 0].astype(np.int64), want)

    def test_random_coefficients_match_loop_idct(self):
        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(11)
        for _ in range(6):
            nbx, nby = int(rng.integers(1, 4)), int(rng.integers(1, 3))
            w, h = nbx * 8, nby * 8
            q = rng.integers(1, 20, size=(8, 8)).astype(np.int64)
            blocks = []
            for _b in range(nbx * nby):
                b = np.zeros((8, 8), dtype=np.int64)
                mask = rng.random((8, 8)) < 0.3
                b[mask] = rng.integers(-40, 40, size=int(mask.sum()))
                blocks.append(b)
            data = M.jpeg_encode_blocks([blocks], w, h, q)
            got = M.decode_image(data)[:, :, 0].astype(np.float64)
            want = np.zeros((h, w))
            for i, b in enumerate(blocks):
                by, bx = divmod(i, nbx)
                want[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(self._ref_idct(b * q) + 128.0), 0, 255
                )
            assert np.array_equal(got, want)

    def test_three_component_ycbcr(self):
        from bm25spark.datapipe import multimodal as M

        yb = []
        for bi in range(2):
            b = np.zeros((8, 8), dtype=np.int64)
            b[0, 0] = 8 * ((50 + bi * 60) - 128)
            yb.append(b)
        zb = [np.zeros((8, 8), dtype=np.int64) for _ in range(2)]
        data = M.jpeg_encode_blocks(
            [yb, zb, zb], 16, 8, np.ones((8, 8), dtype=np.int64)
        )
        px = M.decode_image(data)
        # Cb=Cr=128 makes the BT.601 conversion exact: R=G=B=Y
        assert px.shape == (8, 16, 3)
        assert np.array_equal(px[:, :8, 0], np.full((8, 8), 50, np.uint8))
        assert np.array_equal(px[:, 8:, 0], np.full((8, 8), 110, np.uint8))
        assert np.array_equal(px[:, :, 0], px[:, :, 1])
        assert np.array_equal(px[:, :, 0], px[:, :, 2])

    def test_restart_markers_roundtrip(self):
        """DRI/RSTm: byte-aligned restart markers every 2 MCUs with DC
        predictor resets — constant-block exactness must survive the
        resync on both sides."""
        from bm25spark.datapipe import multimodal as M

        w, h, nbx = 24, 16, 3
        vals = [10, 60, 110, 160, 210, 250]
        blocks = []
        for v in vals:
            b = np.zeros((8, 8), np.int64)
            b[0, 0] = 8 * (v - 128)
            blocks.append(b)
        data = M.jpeg_encode_blocks(
            [blocks], w, h, np.ones((8, 8), np.int64), restart_interval=2
        )
        assert b"\xff\xdd" in data  # DRI segment
        assert b"\xff\xd0" in data and b"\xff\xd1" in data  # RST0, RST1
        px = M.decode_image(data)[:, :, 0].astype(np.int64)
        for i, v in enumerate(vals):
            by, bx = divmod(i, nbx)
            assert np.all(px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == v)

    def test_420_subsampling(self):
        """4:2:0 (Y 2x2, chroma 1x1): within-MCU Y block placement and
        nearest-neighbor chroma upsampling, checked with values that
        make the BT.601 conversion integer-exact (Cr=138 -> R=Y+14,
        G=Y-7, B=Y)."""
        from bm25spark.datapipe import multimodal as M

        yvals = [40, 80, 120, 160]
        yb = []
        for v in yvals:
            b = np.zeros((8, 8), np.int64)
            b[0, 0] = 8 * (v - 128)
            yb.append(b)
        cb = np.zeros((8, 8), np.int64)
        cr = np.zeros((8, 8), np.int64)
        cr[0, 0] = 8 * (138 - 128)
        data = M.jpeg_encode_blocks(
            [yb, [cb], [cr]], 16, 16, np.ones((8, 8), np.int64),
            sampling=[(2, 2), (1, 1), (1, 1)],
        )
        px = M.decode_image(data).astype(np.int64)
        assert px.shape == (16, 16, 3)
        for i, v in enumerate(yvals):
            qy, qx = divmod(i, 2)
            quad = px[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8]
            assert np.all(quad[:, :, 0] == v + 14)
            assert np.all(quad[:, :, 1] == v - 7)
            assert np.all(quad[:, :, 2] == v)

    def test_422_subsampling_with_restarts(self):
        """4:2:2 (Y 2x1) composed with DRI: two MCUs, a restart
        between them, Cb=Cr=128 so RGB == Y exactly."""
        from bm25spark.datapipe import multimodal as M

        yvals = [30, 70, 130, 190]  # 2 MCUs x 2 Y blocks
        yb = []
        for v in yvals:
            b = np.zeros((8, 8), np.int64)
            b[0, 0] = 8 * (v - 128)
            yb.append(b)
        z = [np.zeros((8, 8), np.int64) for _ in range(2)]
        data = M.jpeg_encode_blocks(
            [yb, z, [a.copy() for a in z]], 32, 8,
            np.ones((8, 8), np.int64),
            sampling=[(2, 1), (1, 1), (1, 1)], restart_interval=1,
        )
        assert b"\xff\xd0" in data
        px = M.decode_image(data).astype(np.int64)
        assert px.shape == (8, 32, 3)
        for i, v in enumerate(yvals):
            strip = px[:, i * 8 : i * 8 + 8]
            assert np.all(strip[:, :, 0] == v)
            assert np.all(strip == v)

    def test_gray_oversampled_sof_decodes_nonintervleaved(self):
        """T.81 A.2: a one-component scan is non-interleaved whatever
        SOF's Hi/Vi say — patching a conforming gray stream's sampling
        byte to 2x2 must NOT change the decode (raster block order,
        ceil(w/8) x ceil(h/8) blocks), including non-multiple-of-16
        dimensions where interleaved geometry would mis-count blocks."""
        from bm25spark.datapipe import multimodal as M

        for w, h in ((32, 32), (24, 24)):
            nbx, nby = w // 8, h // 8
            blocks = []
            for i in range(nbx * nby):
                b = np.zeros((8, 8), np.int64)
                b[0, 0] = 8 * ((10 + 10 * i) - 128)
                blocks.append(b)
            data = M.jpeg_encode_blocks(
                [blocks], w, h, np.ones((8, 8), np.int64)
            )
            want = M.decode_image(data)
            patched = bytearray(data)
            sof = data.find(b"\xff\xc0")
            assert patched[sof + 11] == 0x11
            patched[sof + 11] = 0x22  # oversampled gray SOF
            got = M.decode_image(bytes(patched))
            assert np.array_equal(got, want)

    def test_encoder_rejects_gray_subsampling(self):
        """Emitting Hi/Vi > 1 for a one-component stream with the
        interleaved layout would be non-conforming — refuse loudly."""
        from bm25spark.datapipe import multimodal as M

        b = np.zeros((8, 8), np.int64)
        with pytest.raises(ValueError, match="non-interleaved"):
            M.jpeg_encode_blocks(
                [[b] * 4], 16, 16, np.ones((8, 8), np.int64),
                sampling=[(2, 2)],
            )

    def test_truncated_at_restart_raises_valueerror(self):
        """A stream cut at a restart boundary must raise the decoder's
        documented ValueError, not leak a bare IndexError."""
        from bm25spark.datapipe import multimodal as M

        blocks = []
        for v in (10, 60, 110, 160):
            b = np.zeros((8, 8), np.int64)
            b[0, 0] = 8 * (v - 128)
            blocks.append(b)
        data = M.jpeg_encode_blocks(
            [blocks], 32, 8, np.ones((8, 8), np.int64), restart_interval=2
        )
        cut = data.find(b"\xff\xd0")
        assert cut > 0
        for end in (cut, cut + 1):
            with pytest.raises(ValueError, match="truncated at restart"):
                M.decode_image(data[:end])

    def test_honest_refusals(self):
        from bm25spark.datapipe import multimodal as M

        data = bytearray(M.synthesize_jpeg(3))
        sof = bytes(data).find(b"\xff\xc0")
        data[sof + 1] = 0xC1  # extended sequential SOF
        with pytest.raises(NotImplementedError, match="unsupported JPEG"):
            M.decode_image(bytes(data))
        data = bytearray(M.synthesize_jpeg(3))
        data[sof + 11] = 0x33  # Hi/Vi = 3x3 — beyond baseline's common set
        with pytest.raises(NotImplementedError, match="sampling factors"):
            M.decode_image(bytes(data))
        # lossy VP8 (well-formed chunk) refuses loudly; VP8L is real now
        import struct as _struct

        lossy = b"VP8 " + _struct.pack("<I", 10) + b"\x00" * 10
        blob = b"RIFF" + _struct.pack("<I", 4 + len(lossy)) + b"WEBP" + lossy
        with pytest.raises(NotImplementedError, match="VP8L lossless"):
            M.decode_image(blob)

    def test_spark_features_match_oracle(self, spark, docs):
        from bm25spark.datapipe import multimodal as M

        assert_matches(
            M.jpeg_features(M.synthesize_jpeg_media(docs)).orderBy("doc_id"),
            M.image_jpeg_features_sql(),
        )


class TestJpegProgressive:
    """SOF2 (T.81 G): the progressive encoder/decoder pair is verified
    DIFFERENTIALLY against the independently-validated baseline path —
    the same quantized coefficient blocks encoded both ways must
    decode to bit-identical pixels (the scan script reconstructs every
    coefficient exactly at Al=0)."""

    @staticmethod
    def _rand_blocks(rng, n, dens=0.35, lo=-60, hi=60):
        import numpy as _np

        out = []
        for _ in range(n):
            b = _np.zeros((8, 8), _np.int64)
            mask = rng.random((8, 8)) < dens
            b[mask] = rng.integers(lo, hi, size=int(mask.sum()))
            out.append(b)
        return out

    def test_gray_differential_fuzz(self):
        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(7)
        for _ in range(10):
            nbx, nby = int(rng.integers(1, 5)), int(rng.integers(1, 4))
            w = nbx * 8 - int(rng.integers(0, 8))
            h = nby * 8 - int(rng.integers(0, 8))
            nbx, nby = -(-w // 8), -(-h // 8)
            q = rng.integers(1, 12, size=(8, 8)).astype(np.int64)
            blocks = self._rand_blocks(rng, nbx * nby)
            base = M.decode_image(M.jpeg_encode_blocks([blocks], w, h, q))
            prog = M.decode_image(
                M.jpeg_encode_blocks_progressive([blocks], w, h, q)
            )
            assert np.array_equal(base, prog)

    def test_color_subsampled_with_restarts(self):
        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(21)
        for trial in range(9):
            samp = [
                [(1, 1)] * 3,
                [(2, 2), (1, 1), (1, 1)],
                [(2, 1), (1, 1), (1, 1)],
            ][trial % 3]
            hmax = max(s[0] for s in samp)
            vmax = max(s[1] for s in samp)
            nmx, nmy = int(rng.integers(1, 3)), int(rng.integers(1, 3))
            w = nmx * 8 * hmax - int(rng.integers(0, 8))
            h = nmy * 8 * vmax - int(rng.integers(0, 8))
            nmx = -(-w // (8 * hmax))
            nmy = -(-h // (8 * vmax))
            q = rng.integers(1, 10, size=(8, 8)).astype(np.int64)
            comp_blocks = [
                self._rand_blocks(rng, nmx * nmy * s[0] * s[1]) for s in samp
            ]
            ri = int(rng.integers(0, 3))
            base = M.decode_image(
                M.jpeg_encode_blocks(
                    comp_blocks, w, h, q, sampling=samp, restart_interval=ri
                )
            )
            prog = M.decode_image(
                M.jpeg_encode_blocks_progressive(
                    comp_blocks, w, h, q, sampling=samp, restart_interval=ri
                )
            )
            assert np.array_equal(base, prog)

    def test_scan_scripts(self):
        """Deeper successive approximation (Al up to 3), band splits,
        and a no-approximation multi-band script all reconstruct."""
        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(33)
        scripts = [
            [((0,), 0, 0, 0, 3), ((0,), 0, 0, 3, 2), ((0,), 0, 0, 2, 1),
             ((0,), 0, 0, 1, 0), (0, 1, 63, 0, 3), (0, 1, 63, 3, 2),
             (0, 1, 63, 2, 1), (0, 1, 63, 1, 0)],
            [((0,), 0, 0, 0, 0), (0, 1, 2, 0, 0), (0, 3, 9, 0, 0),
             (0, 10, 35, 0, 0), (0, 36, 63, 0, 0)],
            [((0,), 0, 0, 0, 2), (0, 1, 10, 0, 1), (0, 11, 63, 0, 1),
             ((0,), 0, 0, 2, 1), (0, 1, 10, 1, 0), ((0,), 0, 0, 1, 0),
             (0, 11, 63, 1, 0)],
        ]
        for script in scripts:
            for _ in range(3):
                nbx, nby = int(rng.integers(1, 6)), int(rng.integers(1, 4))
                w = nbx * 8 - int(rng.integers(0, 8))
                h = nby * 8 - int(rng.integers(0, 8))
                nbx, nby = -(-w // 8), -(-h // 8)
                q = rng.integers(1, 8, size=(8, 8)).astype(np.int64)
                blocks = self._rand_blocks(rng, nbx * nby, dens=0.4)
                base = M.decode_image(M.jpeg_encode_blocks([blocks], w, h, q))
                prog = M.decode_image(
                    M.jpeg_encode_blocks_progressive(
                        [blocks], w, h, q, scans=script
                    )
                )
                assert np.array_equal(base, prog)

    def test_zrl_and_long_eob_runs(self):
        """Adversarial entropy shapes: nonzero only at the zigzag
        band's far ends (ZRL chains in first AND refinement scans) and
        a 40-block EOB run (EOBn symbol with extension bits)."""
        from bm25spark.datapipe import multimodal as M

        q = np.ones((8, 8), np.int64)
        zzpos = M._ZIGZAG
        nat = np.zeros(64, np.int64)
        nat[zzpos[1]] = 40
        nat[zzpos[63]] = -37
        blocks = [nat.reshape(8, 8)]
        base = M.decode_image(M.jpeg_encode_blocks([blocks], 8, 8, q))
        prog = M.decode_image(
            M.jpeg_encode_blocks_progressive([blocks], 8, 8, q)
        )
        assert np.array_equal(base, prog)

        rng = np.random.default_rng(5)
        blocks = []
        for i in range(40):
            nat = np.zeros(64, np.int64)
            nat[0] = 8 * (int(rng.integers(0, 256)) - 128)
            if i in (0, 39):
                nat[zzpos[5]] = 25
            blocks.append(nat.reshape(8, 8))
        base = M.decode_image(M.jpeg_encode_blocks([blocks], 80, 32, q))
        prog = M.decode_image(
            M.jpeg_encode_blocks_progressive([blocks], 80, 32, q)
        )
        assert np.array_equal(base, prog)

    def test_mixed_significance_refinement(self):
        """Blocks mixing large coefficients (correction bits across
        several refinement scans) with +-1..3 values that become
        significant at different Al levels."""
        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(11)
        q = np.ones((8, 8), np.int64)
        script = [((0,), 0, 0, 0, 2), ((0,), 0, 0, 2, 1), ((0,), 0, 0, 1, 0),
                  (0, 1, 63, 0, 3), (0, 1, 63, 3, 2), (0, 1, 63, 2, 1),
                  (0, 1, 63, 1, 0)]
        for _ in range(6):
            blocks = []
            for _b in range(6):
                nat = np.zeros(64, np.int64)
                kbig = rng.choice(64, size=4, replace=False)
                ksmall = rng.choice(64, size=6, replace=False)
                nat[kbig] = rng.integers(-120, 120, 4)
                nat[ksmall] += rng.integers(-3, 4, 6)
                blocks.append(nat.reshape(8, 8))
            base = M.decode_image(M.jpeg_encode_blocks([blocks], 48, 8, q))
            prog = M.decode_image(
                M.jpeg_encode_blocks_progressive(
                    [blocks], 48, 8, q, scans=script
                )
            )
            assert np.array_equal(base, prog)

    def test_synthesized_closed_form(self):
        """The progressive fixtures decode to the closed-form
        per-block constants (the SQL oracle's contract)."""
        from bm25spark.datapipe import multimodal as M

        for d in range(25):
            data = M.synthesize_jpeg_progressive(d)
            assert data[2:4] == b"\xff\xe0" and b"\xff\xc2" in data
            px = M.decode_image(data)
            w, h = M.jpeg_progressive_dims(d)
            assert px.shape == (h, w, 1)
            nbx = -(-w // 8)
            p = np.arange(w * h)
            bi = (p // w) // 8 * nbx + (p % w) // 8
            want = ((d * M.IMG_MIX_A + bi * M.IMG_MIX_B) % 256).reshape(h, w)
            assert np.array_equal(px[:, :, 0].astype(np.int64), want)

    def test_spark_features_match_oracle(self, spark, docs):
        from bm25spark.datapipe import multimodal as M

        assert_matches(
            M.jpeg_features(
                M.synthesize_jpeg_progressive_media(docs)
            ).orderBy("doc_id"),
            M.image_jpeg_progressive_features_sql(),
        )

    def test_refinement_step_validated(self):
        """A scan script whose refinement jumps more than one Al step
        (Ah != Al+1) can't be represented by single correction bits —
        the encoder must refuse (T.81 G.1.1.1.2), not emit a stream
        that decodes to wrong pixels."""
        from bm25spark.datapipe import multimodal as M

        q = np.ones((8, 8), np.int64)
        nat = np.zeros(64, np.int64)
        nat[M._ZIGZAG[5]] = 42
        blocks = [nat.reshape(8, 8)]
        bad = [((0,), 0, 0, 0, 0), (0, 1, 63, 0, 2), (0, 1, 63, 2, 0)]
        with pytest.raises(ValueError, match="Ah=Al\\+1"):
            M.jpeg_encode_blocks_progressive([blocks], 8, 8, q, scans=bad)

    def test_unsupported_component_counts_refused(self):
        """2- and 4-component frames (e.g. Adobe CMYK) must refuse
        loudly rather than crash or silently emit wrong RGB. The
        encoder refuses to write them, so splice the SOF by hand."""
        import struct

        from bm25spark.datapipe import multimodal as M

        for ncomp in (2, 4):
            sof = struct.pack(">BHHB", 8, 8, 8, ncomp)
            for c in range(ncomp):
                sof += struct.pack(">BBB", c + 1, 0x11, 0)
            data = (
                b"\xff\xd8"
                + b"\xff\xc0"
                + struct.pack(">H", 2 + len(sof))
                + sof
            )
            with pytest.raises(NotImplementedError, match="component"):
                M.decode_image(data)

    def test_com_and_appn_between_scans(self):
        """COM/APPn are legal tables/misc segments before any SOS
        (T.81 B.2.3/B.2.4) — the multi-scan walker must skip them."""
        from bm25spark.datapipe import multimodal as M

        data = M.synthesize_jpeg_progressive(4)
        ref = M.decode_image(data)
        # splice a COM and an APP1 before the SECOND SOS
        first_sos = data.index(b"\xff\xda")
        second_sos = data.index(b"\xff\xda", first_sos + 2)
        com = b"\xff\xfe" + (4).to_bytes(2, "big") + b"ok"
        app1 = b"\xff\xe1" + (7).to_bytes(2, "big") + b"Exif\x00"
        spliced = data[:second_sos] + com + app1 + data[second_sos:]
        assert np.array_equal(M.decode_image(spliced), ref)

    def test_malformed_streams_raise_valueerror(self):
        """decode_image's refuse-loudly contract: truncations and byte
        flips surface as ValueError (or NotImplementedError for
        unsupported-mode flips), never bare struct/index/key errors."""
        from bm25spark.datapipe import multimodal as M

        for fixture in (M.synthesize_jpeg(3), M.synthesize_jpeg_progressive(3)):
            for cut in range(2, len(fixture), 7):
                try:
                    M.decode_image(fixture[:cut])
                except (ValueError, NotImplementedError):
                    pass
            rng = np.random.default_rng(17)
            for _ in range(400):
                buf = bytearray(fixture)
                i = int(rng.integers(2, len(buf)))
                buf[i] ^= int(rng.integers(1, 256))
                try:
                    M.decode_image(bytes(buf))
                except (ValueError, NotImplementedError):
                    pass


class TestIvfPq:
    """Composed IVFPQ: oracle differential, recall gate, and proof
    that the coarse lists actually prune (a vector outside every
    probed list never reaches the ADC stream)."""

    def test_matches_duckdb_oracle(self, spark, emb):
        from bm25spark.datapipe import similarity as S

        rows = sorted(
            (tuple(r) for r in emb.select("vec_id", "embedding").collect()),
        )[:65536]
        tmat = np.array([r[1] for r in rows], dtype=np.float64)
        cent, books = S.ivfpq_train(tmat)
        assert_matches(
            S.ann_ivfpq_topk(emb), S.ann_ivfpq_topk_sql(cent, books)
        )

    def test_recall_vs_brute_force(self, spark, emb):
        from bm25spark.datapipe import similarity as S

        exact = S.ann_cosine_topk(emb).collect()
        got_rows = S.ann_ivfpq_topk(emb).collect()
        ex, got = {}, {}
        for r in exact:
            ex.setdefault(r.probe_id, set()).add(r.vec_id)
        for r in got_rows:
            got.setdefault(r.probe_id, set()).add(r.vec_id)
        recs = [len(ex[p] & got.get(p, set())) / len(ex[p]) for p in ex]
        # two approximations stack (coarse pruning AND PQ ranking) on
        # near-random worst-case embeddings: gate the floor loosely
        # but meaningfully (measured ~0.6 mean at sf0.001 defaults)
        assert sum(recs) / len(recs) >= 0.4, recs
        # genuinely approximate — differs from exact somewhere
        assert any(ex[p] != got.get(p, set()) for p in ex)

    def test_coarse_lists_actually_prune(self, spark, emb):
        """Every ADC candidate's coarse assignment must be one of its
        probe's nprobe probed lists — the inverted-list pruning is
        real, not decorative."""
        from bm25spark.datapipe import similarity as S

        rows = sorted(
            (tuple(r) for r in emb.select("vec_id", "embedding").collect()),
        )
        tmat = np.array([r[1] for r in rows], dtype=np.float64)
        cent, books = S.ivfpq_train(tmat)
        pr = sorted(
            emb.filter(F.col("vec_id").isin(S.PROBES)).collect(),
            key=lambda r: r.vec_id,
        )
        pids = np.array([int(r.vec_id) for r in pr], dtype=np.int64)
        pmat = np.array([r.embedding for r in pr], dtype=np.float64)
        plists = S._ivf_probe_lists(pmat, cent, S.LSH_QUANT, S.IVF_NPROBE)
        luts = S.ivfpq_probe_luts(pmat, cent, books, plists, S.LSH_QUANT)
        cands = S.ivfpq_adc_candidates(
            emb, cent, books, luts, plists, pids
        ).collect()
        assign = {
            int(v): int(c)
            for v, c in zip(
                [r[0] for r in rows],
                S._ivf_assign(tmat, cent, S.LSH_QUANT),
            )
        }
        probed = {int(p): set(cids) for p, cids in zip(pids, plists)}
        assert cands, "ADC stream empty"
        # THE pruning proof: every emitted candidate's coarse
        # assignment is one of its probe's nprobe probed lists
        for r in cands:
            assert assign[r.vec_id] in probed[r.probe_id]
        # stronger when possible: vectors assigned to a cid that NO
        # probe probes must be absent from the entire stream (this
        # isolates list pruning from the pool cut; skipped only if
        # the probes happen to cover every cluster)
        union = set().union(*probed.values())
        uncovered = {
            v for v, c in assign.items() if c not in union
        }
        if uncovered:
            seen = {r.vec_id for r in cands}
            assert not (uncovered & seen)


class TestPQ:
    """Product-quantization ANN: oracle differential, recall gate vs
    brute force, and trainer invariants."""

    def test_matches_duckdb_oracle(self, spark, emb):
        import numpy as np

        from bm25spark.datapipe import similarity as S

        rows = sorted(
            (tuple(r) for r in emb.select("vec_id", "embedding").collect()),
        )[:65536]
        tmat = np.array([r[1] for r in rows], dtype=np.float64)
        books = S.pq_train(tmat)
        assert_matches(
            S.ann_pq_topk(emb), S.ann_pq_topk_sql(books)
        )

    def test_recall_vs_brute_force(self, spark, emb):
        from bm25spark.datapipe import similarity as S

        exact = S.ann_cosine_topk(emb).collect()
        pq = S.ann_pq_topk(emb).collect()
        ex, got = {}, {}
        for r in exact:
            ex.setdefault(r.probe_id, set()).add(r.vec_id)
        for r in pq:
            got.setdefault(r.probe_id, set()).add(r.vec_id)
        recs = [len(ex[p] & got.get(p, set())) / len(ex[p]) for p in ex]
        # near-random synthetic embeddings are PQ's worst case;
        # measured 0.65+ min at sf0.001 with the default pool
        assert min(recs) >= 0.5 and sum(recs) / len(recs) >= 0.7, recs
        # genuinely approximate: the pool cut must be visible (PQ
        # output differs from exact somewhere, else the gate proves
        # nothing about the ADC path)
        assert any(ex[p] != got.get(p, set()) for p in ex)

    def test_adc_scan_rowcount_bound(self, spark, emb):
        """Plan guard for the batch-local top-pool cut: the pre-window
        candidate frame carries at most batches*P*pool rows (NOT n*P),
        and the cut is lossless — ann_pq_topk's output is unchanged
        (pinned separately by the oracle differential above)."""
        from bm25spark.datapipe import similarity as S

        rows = sorted(
            (tuple(r) for r in emb.select("vec_id", "embedding").collect()),
        )
        tmat = np.array([r[1] for r in rows], dtype=np.float64)
        books = S.pq_train(tmat)
        sd = books.shape[2]
        pr = sorted(
            emb.filter(F.col("vec_id").isin(S.PROBES)).collect(),
            key=lambda r: r.vec_id,
        )
        pids = np.array([int(r.vec_id) for r in pr], dtype=np.int64)
        pmat = np.array([r.embedding for r in pr], dtype=np.float64)
        pq_ = np.floor(pmat * float(S.LSH_QUANT)).astype(np.int64)
        luts = np.stack(
            [
                S._sq_dists(pq_[:, s * sd : (s + 1) * sd], books[s])
                for s in range(S.PQ_M)
            ],
            axis=1,
        )
        n = len(rows)
        assert n > S.PQ_POOL, "corpus must exceed pool for the bound to bite"
        two = emb.repartition(2)
        per_part = (
            two.select("vec_id")
            .rdd.mapPartitions(lambda it: [sum(1 for _ in it)])
            .collect()
        )
        max_batch = int(
            spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        )
        batches = sum(-(-c // max_batch) for c in per_part if c)
        cnt = S.pq_adc_candidates(two, books, luts, pids).count()
        assert cnt <= batches * len(pids) * S.PQ_POOL
        assert cnt < n * len(pids)  # strictly below the uncut size

    def test_trainer_invariants(self):
        import numpy as np
        import pytest as _pytest

        from bm25spark.datapipe import similarity as S

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(200, 64))
        b1 = S.pq_train(vecs)
        b2 = S.pq_train(vecs)
        assert b1.shape == (S.PQ_M, S.PQ_KS, 64 // S.PQ_M)
        assert np.array_equal(b1, b2)  # deterministic
        with _pytest.raises(ValueError, match="divisible"):
            S.pq_train(vecs[:, :63], m=8)
        codes = S._pq_encode(vecs, b1, S.LSH_QUANT)
        assert codes.shape == (200, S.PQ_M)
        assert codes.min() >= 0 and codes.max() < S.PQ_KS


class TestPngColorTypes:
    """PNG decode covers color types 0 (gray) and 6 (RGBA) besides
    RGB; palette (type 3) is refused loudly."""

    @staticmethod
    def _write(px, ctype):
        import struct
        import zlib

        import numpy as np

        from bm25spark.datapipe import multimodal as M

        h, w, c = px.shape
        raw = bytearray()
        prev = np.zeros((w, c), dtype=np.int64)
        for r in range(h):
            row = px[r].astype(np.int64)
            f = r % 5
            left = np.vstack([np.zeros((1, c), dtype=np.int64), row[:-1]])
            if f == 0:
                filt = row
            elif f == 1:
                filt = row - left
            elif f == 2:
                filt = row - prev
            elif f == 3:
                filt = row - (left + prev) // 2
            else:
                ul = np.vstack([np.zeros((1, c), dtype=np.int64), prev[:-1]])
                p_ = left + prev - ul
                pa = np.abs(p_ - left)
                pb = np.abs(p_ - prev)
                pc = np.abs(p_ - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev, ul),
                )
                filt = row - pred
            raw.append(f)
            raw.extend((filt % 256).astype(np.uint8).tobytes())
            prev = row

        def chunk(t, p):
            return (
                struct.pack(">I", len(p)) + t + p
                + struct.pack(">I", zlib.crc32(t + p) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (
            M._PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    def test_gray_and_rgba_roundtrip(self):
        import numpy as np

        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(5)
        for ctype, c in ((0, 1), (2, 3), (6, 4)):
            px = rng.integers(0, 256, size=(7, 6, c), dtype=np.uint8)
            got = M.decode_image(self._write(px, ctype))
            assert got.shape == (7, 6, c)
            assert np.array_equal(got, px), ctype

    def test_palette_refused(self):
        import numpy as np
        import pytest as _pytest

        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(5)
        px = rng.integers(0, 256, size=(4, 4, 1), dtype=np.uint8)
        with _pytest.raises(ValueError, match="unsupported PNG"):
            M.decode_image(self._write(px, 3))


class TestGifReal:
    """REAL LZW compressed-image path: genuine GIF89a containers,
    decoded with pure Python+NumPy, bit-exact vs the closed forms."""

    def test_roundtrip_bit_exact(self):
        import numpy as np

        from bm25spark.datapipe import multimodal as M

        for i in list(range(15)) + [97, 4095, 65535]:
            w, h = M.gif_dims(i)
            got = M.decode_image(M.synthesize_gif(i))
            want = M._gif_palette(i)[
                M._gif_index_pixels(i, w, h)
            ].reshape(h, w, 3)
            assert got.shape == (h, w, 3)
            assert np.array_equal(got, want), i

    def test_lzw_differential_fuzz(self):
        """Encoder and decoder agree on random index streams across
        code widths, dictionary growth, and the 4096 reset."""
        import numpy as np

        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(0)
        for trial in range(120):
            n = int(rng.integers(1, 3000))
            mcs = int(rng.integers(2, 9))
            idx = rng.integers(0, 1 << mcs, size=n)
            if trial % 3 == 0:  # repetitive -> dictionary actually grows
                idx = np.tile(idx[: max(1, n // 10)], 10)[:n]
            dec = M._gif_lzw_decode(
                M._gif_lzw_encode(idx, mcs), mcs, len(idx)
            )
            assert np.array_equal(dec, idx), (trial, mcs, n)

    def test_lzw_dictionary_reset_at_4096(self):
        """Streams long/diverse enough to force the CLEAR-code reset
        (>4078 dictionary insertions) roundtrip across the reset — the
        short fuzz above never reaches it (caps at ~3018 entries)."""
        import numpy as np

        from bm25spark.datapipe import multimodal as M

        rng = np.random.default_rng(7)
        for mcs, n in ((8, 6000), (8, 20000), (4, 30000), (2, 40000)):
            idx = rng.integers(0, 1 << mcs, size=n)
            dec = M._gif_lzw_decode(M._gif_lzw_encode(idx, mcs), mcs, n)
            assert np.array_equal(dec, idx), (mcs, n)
            # structured repetition too: long repeats grow the
            # dictionary fastest and stress codes spanning the reset
            rep = np.tile(idx[:97], n // 97 + 1)[:n]
            dec = M._gif_lzw_decode(M._gif_lzw_encode(rep, mcs), mcs, n)
            assert np.array_equal(dec, rep), (mcs, n, "rep")

    def test_extension_blocks_skipped(self):
        """A Graphic Control Extension before the image descriptor
        (what real encoders emit) is skipped, not fatal."""
        import numpy as np

        from bm25spark.datapipe import multimodal as M

        blob = M.synthesize_gif(5)
        gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        pos = blob.index(b"\x2c")
        patched = blob[:pos] + gce + blob[pos:]
        assert np.array_equal(M.decode_image(patched), M.decode_image(blob))

    def test_corruption_fails_loudly(self):
        import pytest as _pytest

        from bm25spark.datapipe import multimodal as M

        good = M.synthesize_gif(5)
        with _pytest.raises(ValueError, match="global color table"):
            b = bytearray(good)
            b[10] &= 0x7F  # clear GCT flag
            M.decode_image(bytes(b))
        with _pytest.raises(ValueError, match="interlaced"):
            b = bytearray(good)
            b[good.index(b"\x2c") + 9] |= 0x40
            M.decode_image(bytes(b))
        with _pytest.raises(ValueError, match="truncated|underrun"):
            M.decode_image(good[:-10])

    def test_spark_features_match_oracle(self, spark, docs):
        from bm25spark.datapipe import multimodal as M

        assert_matches(
            M.gif_features(M.synthesize_gif_media(docs)).orderBy("doc_id"),
            M.image_gif_features_sql(),
        )


class TestCorpusPipeline:
    """The end-to-end composition: its verdict must equal applying the
    four proven operators independently, and the materializer must
    return exactly the kept docs."""

    def test_verdict_equals_independent_operators(self, spark, docs):
        from bm25spark.datapipe import (
            decontam, dedup, pipeline, splits, textstats,
        )

        bench = docs.filter(F.col("doc_id") % 97 == 0)
        got = {
            r.doc_id: (r.is_duplicate, r.quality_keep, r.contaminated,
                       r.split, r.keep)
            for r in pipeline.prepare_corpus(
                docs, benchmark=bench, decontam_n=4
            ).collect()
        }
        canon = {r.doc_id: r.keep
                 for r in dedup.dedup_keep_canonical(docs).collect()}
        qf = {r.doc_id: r.keep
              for r in textstats.corpus_quality_filter(docs).collect()}
        dc = {r.doc_id: r.contaminated
              for r in decontam.decontaminate_ngrams(
                  docs, bench, n=4).collect()}
        sp = {r.doc_id: r.split
              for r in splits.split_assign(docs).collect()}
        assert set(got) == set(canon)
        for d, (is_dup, qkeep, cont, split, keep) in got.items():
            assert is_dup == (not canon[d])
            assert qkeep == qf[d]
            assert cont == dc.get(d, False)
            assert split == sp[d]
            assert keep == ((not is_dup) and qkeep and (not cont))
        # the composition actually filters something at this SF
        assert any(not v[4] for v in got.values())
        assert any(v[4] for v in got.values())

    def test_prepare_corpus_keeps_null_text_rows(self, spark):
        """The audit frame's ONE-row-per-input-document contract must
        hold for NULL-text docs (r7 advice fix: the quality stages
        filter text IS NOT NULL, so the old inner join silently
        dropped them): they appear with quality_keep=false and the
        explicit 'null_text' reason, and are not kept."""
        from bm25spark.datapipe import pipeline

        rows = [(1, "the quick brown fox " * 20), (2, None),
                (3, "a different document with words " * 15)]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {r.doc_id: r for r in pipeline.prepare_corpus(df).collect()}
        assert set(got) == {1, 2, 3}
        assert got[2].quality_keep is False
        assert got[2].quality_reasons == "null_text"
        assert got[2].keep is False
        assert got[2].canonical_id == 2 and got[2].split is not None

    def test_clean_corpus_materializer(self, spark, docs):
        from bm25spark.datapipe import pipeline

        verdict = pipeline.prepare_corpus(docs)
        kept = {r.doc_id for r in verdict.filter(F.col("keep")).collect()}
        out = pipeline.clean_corpus(docs)
        assert {r.doc_id for r in out.collect()} == kept
        # original columns survive, split is attached
        assert set(out.columns) == set(docs.columns) | {"split"}

    def test_no_benchmark_means_no_contamination(self, spark, docs):
        from bm25spark.datapipe import pipeline

        got = pipeline.prepare_corpus(docs).collect()
        assert all(not r.contaminated for r in got)


class TestAnnRecallReport:
    def test_report_shape_and_bounds(self, spark, emb):
        from bm25spark.datapipe import similarity as S

        rows = S.ann_recall_report(emb).collect()
        methods = {r.method for r in rows}
        assert methods == {"lsh", "ivf", "pq", "ivfpq"}
        # one row per (method, probe)
        assert len(rows) == 4 * len(S.PROBES)
        assert all(0.0 <= r.recall <= 1.0 for r in rows)
        # every path must beat random on the 500-vector corpus
        # (k/n = 0.02); the report exists to show HOW MUCH
        by_m = {}
        for r in rows:
            by_m.setdefault(r.method, []).append(r.recall)
        for m, recs in by_m.items():
            assert sum(recs) / len(recs) > 0.2, (m, recs)

    def test_matches_independent_recall_math(self, spark, emb):
        """The report's ivfpq column equals recall computed directly
        from the two result frames."""
        from bm25spark.datapipe import similarity as S

        rep = {
            r.probe_id: r.recall
            for r in S.ann_recall_report(emb).collect()
            if r.method == "ivfpq"
        }
        exact, got = {}, {}
        for r in S.ann_cosine_topk(emb).collect():
            exact.setdefault(r.probe_id, set()).add(r.vec_id)
        for r in S.ann_ivfpq_topk(emb).collect():
            got.setdefault(r.probe_id, set()).add(r.vec_id)
        for p, want in exact.items():
            assert rep[p] == round(
                len(want & got.get(p, set())) / len(want), 4
            )
