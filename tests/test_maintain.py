"""Mutation lifecycle tests — the reference fuzz harness's operation
mix (tests/fuzz:43-59: insert/select/delete/vacuum) with a pure-Python
oracle that replicates the reference's *stale-statistics* semantics:
between vacuums, N/avgdl/df come from the sealed segment only;
tombstoned docs are skipped but still count in the statistics; delta
docs are scored with sealed stats and sealed dictionary."""

from __future__ import annotations

import random
import time
from collections import Counter

import pytest
from pyspark.sql import functions as F

from bm25spark.build import build_index
from bm25spark.config import Bm25Config
from bm25spark.fieldnorm import length_to_fieldnorm
from bm25spark.index import Bm25Index
from bm25spark.maintain import (
    delete,
    delta_size,
    insert,
    maybe_vacuum,
    search_with_delta,
    vacuum,
)
from bm25spark.scoring import idf, tf_score

VOCAB = 300
DOC_LEN = 30


def _mkdoc(rnd, i):
    return (i, " ".join(f"t{rnd.randrange(VOCAB)}" for _ in range(DOC_LEN)))


class PyOracle:
    """Sealed/delta/tombstone state machine with reference scoring."""

    def __init__(self, rows):
        self.sealed = dict(rows)  # id -> text (includes tombstoned)
        self.tomb = set()
        self.delta = {}  # id -> text

    def insert(self, i, text):
        self.delta[i] = text

    def delete(self, i):
        if i in self.sealed:
            self.tomb.add(i)
        self.delta.pop(i, None)

    def vacuum(self):
        live = {i: t for i, t in self.sealed.items() if i not in self.tomb}
        live.update(self.delta)
        self.sealed, self.delta, self.tomb = live, {}, set()

    def search(self, qtokens, k, k1=1.2, b=0.75):
        tf = {i: Counter(t.split()) for i, t in self.sealed.items()}
        n = len(self.sealed)
        if not n:
            sealed_df = {}
            avgdl = 0.0
        else:
            avgdl = sum(sum(c.values()) for c in tf.values()) / n
            sealed_df = {
                t: sum(1 for c in tf.values() if c[t]) for t in set(qtokens)
            }
        hits = []

        def score(counts):
            dl = sum(counts.values())
            fn = int(length_to_fieldnorm(dl))
            s = 0.0
            for t in sorted(set(qtokens)):
                df = sealed_df.get(t, 0)
                if df and counts[t]:
                    s += float(idf(n, df)) * float(
                        tf_score(fn, counts[t], k1, b, avgdl)
                    )
            return s

        for i, t in self.sealed.items():
            if i in self.tomb:
                continue
            s = score(tf[i])
            if s > 0:
                hits.append((i, s))
        for i, t in self.delta.items():
            s = score(Counter(t.split()))
            if s > 0:
                hits.append((i, s))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]


@pytest.fixture()
def lifecycle(spark, tmp_path):
    rnd = random.Random(11)
    rows = [_mkdoc(rnd, i) for i in range(200)]
    d = str(tmp_path / "idx")
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    build_index(spark, df, d, "text", ["doc_id"], cfg=Bm25Config(shard_size=128))
    return d, PyOracle(rows), rnd


def _score_each(oracle, texts, qtokens, k1=1.2, b=0.75):
    """Score each text independently with the oracle's *sealed* stats
    (the delta-scoring rule): one score per input text."""
    tf = {i: Counter(t.split()) for i, t in oracle.sealed.items()}
    n = len(oracle.sealed)
    avgdl = sum(sum(c.values()) for c in tf.values()) / n
    sealed_df = {t: sum(1 for c in tf.values() if c[t]) for t in set(qtokens)}
    out = []
    for text in texts:
        counts = Counter(text.split())
        fn = int(length_to_fieldnorm(sum(counts.values())))
        s = 0.0
        for t in sorted(set(qtokens)):
            df = sealed_df.get(t, 0)
            if df and counts[t]:
                s += float(idf(n, df)) * float(
                    tf_score(fn, counts[t], k1, b, avgdl)
                )
        out.append(s)
    return out


def canon(hits, nd=9):
    return sorted(((round(s, nd), i) for i, s in hits), key=lambda t: (-t[0], t[1]))


def _check(spark, d, oracle, rnd, q, k=50):
    got = search_with_delta(spark, d, q, k, "text")
    got_ids = [(p[0], s) for p, s in got]
    want = oracle.search(q.split(), k)
    assert canon(got_ids) == canon(want), (q, got_ids[:5], want[:5])


class TestLifecycle:
    def test_fuzz_ops(self, spark, lifecycle):
        d, oracle, rnd = lifecycle
        next_id = 1000
        ops = (["insert"] * 2 + ["select"] * 4 + ["delete"] * 3 + ["vacuum"]) * 3
        rnd.shuffle(ops)
        live_ids = list(range(200))
        for op in ops:
            if op == "insert":
                i, text = _mkdoc(rnd, next_id)
                next_id += 1
                live_ids.append(i)
                insert(
                    spark,
                    d,
                    spark.createDataFrame([(i, text)], "doc_id INT, text STRING"),
                    "text",
                )
                oracle.insert(i, text)
            elif op == "delete" and live_ids:
                i = live_ids.pop(rnd.randrange(len(live_ids)))
                delete(
                    spark, d, spark.createDataFrame([(i,)], "doc_id INT")
                )
                oracle.delete(i)
            elif op == "select":
                q = " ".join(f"t{rnd.randrange(VOCAB)}" for _ in range(rnd.randint(1, 3)))
                _check(spark, d, oracle, rnd, q)
            elif op == "vacuum":
                vacuum(spark, d, "text")
                oracle.vacuum()
        # final vacuum + verify (the reference harness ends the same way)
        vacuum(spark, d, "text")
        oracle.vacuum()
        _check(spark, d, oracle, rnd, "t1 t2 t3", k=100)

    def test_insert_visible_before_vacuum(self, spark, lifecycle):
        d, oracle, rnd = lifecycle
        text = "t1 " * 20 + "zz_unique_term"
        insert(spark, d, spark.createDataFrame([(999, text.strip())], "doc_id INT, text STRING"), "text")
        oracle.insert(999, text.strip())
        # t1 is in the sealed dictionary -> delta doc must surface
        got = search_with_delta(spark, d, "t1", 300, "text")
        assert any(p[0] == 999 for p, _ in got)
        # zz_unique_term is NOT in the sealed dictionary -> no hits
        assert search_with_delta(spark, d, "zz_unique_term", 10, "text") == []
        # after vacuum the new term is indexed
        vacuum(spark, d, "text")
        oracle.vacuum()
        got = search_with_delta(spark, d, "zz_unique_term", 10, "text")
        assert [p[0] for p, _ in got] == [999]

    def test_reinsert_after_delete_is_live(self, spark, lifecycle):
        """Sequenced tombstones: delete(key) then insert(key) leaves the
        re-inserted row visible (reference heap semantics — a tuple
        inserted after a DELETE is a new, live tuple), and it survives
        vacuum."""
        d, oracle, rnd = lifecycle

        def ins(text):
            insert(
                spark,
                d,
                spark.createDataFrame([(555, text)], "doc_id INT, text STRING"),
                "text",
            )

        ins("t1 t1 t1 t1 t1")
        delete(spark, d, spark.createDataFrame([(555,)], "doc_id INT"))
        got = search_with_delta(spark, d, "t1", 300, "text")
        assert all(p[0] != 555 for p, _ in got)
        ins("t1 t1 t1 t1 t1")
        got = search_with_delta(spark, d, "t1", 300, "text")
        assert any(p[0] == 555 for p, _ in got)
        vacuum(spark, d, "text")
        got = search_with_delta(spark, d, "t1", 300, "text")
        assert any(p[0] == 555 for p, _ in got)

    def test_reinsert_of_deleted_sealed_key(self, spark, lifecycle):
        """Delete a *sealed* doc, then re-insert the same key: the
        sealed copy stays hidden, the delta copy is live."""
        d, oracle, rnd = lifecycle
        hits = search_with_delta(spark, d, "t1", 300, "text")
        victim = hits[0][0][0]
        delete(spark, d, spark.createDataFrame([(victim,)], "doc_id INT"))
        insert(
            spark,
            d,
            spark.createDataFrame(
                [(victim, "t1 t1 t1 t1 t1 t1 t1 t1")], "doc_id INT, text STRING"
            ),
            "text",
        )
        got = search_with_delta(spark, d, "t1", 300, "text")
        ids = [p[0] for p, _ in got]
        assert ids.count(victim) == 1  # delta copy only, sealed masked

    def test_auto_seal_threshold(self, spark, lifecycle):
        d, oracle, rnd = lifecycle
        n0 = Bm25Index(spark, d).n_docs
        # no delta -> no-op
        assert maybe_vacuum(spark, d, "text", max_delta_rows=5) is False
        rows = [_mkdoc(rnd, 2000 + j) for j in range(4)]
        insert(
            spark,
            d,
            spark.createDataFrame(rows, "doc_id INT, text STRING"),
            "text",
        )
        assert maybe_vacuum(spark, d, "text", max_delta_rows=5) is False
        assert delta_size(spark, d) == 4  # under threshold: still growing
        rows = [_mkdoc(rnd, 3000 + j) for j in range(4)]
        insert(
            spark,
            d,
            spark.createDataFrame(rows, "doc_id INT, text STRING"),
            "text",
        )
        assert maybe_vacuum(spark, d, "text", max_delta_rows=5) is True
        assert delta_size(spark, d) == 0
        assert Bm25Index(spark, d).n_docs == n0 + 8

    def test_driver_path_guardrail(self, spark, lifecycle):
        """search() refuses above the driver-residency guardrail;
        search_df() auto-routes to the distributed kernel with the same
        (rounded score, id) output."""
        d, _, _ = lifecycle
        idx = Bm25Index(spark, d)
        with pytest.raises(ValueError, match="guardrail"):
            idx.search("t1 t2", 10, max_driver_docs=10)
        via_driver = [
            (tuple(r)[:-1], r["score"])
            for r in idx.search_df("t1 t2", 10).collect()
        ]
        via_routed = [
            (tuple(r)[:-1], r["score"])
            for r in idx.search_df("t1 t2", 10, max_driver_docs=10).collect()
        ]
        assert via_driver == via_routed

    def test_duplicate_key_delta_rows_score_independently(self, spark, lifecycle):
        """Two live inserts sharing a payload key are two independent
        pseudo-docs: each scored with its own doc_len/tf against the
        sealed stats (reference heap semantics — every inserted tuple
        is its own document), both before vacuum (grouped on the
        per-row id, not the payload key) and after (each gets its own
        doc_id)."""
        d, oracle, rnd = lifecycle
        texts = ["t1 t1 t1", "t1 t2 t2 t2 t2 t2 t2 t2"]
        for t in texts:
            insert(
                spark,
                d,
                spark.createDataFrame([(777, t)], "doc_id INT, text STRING"),
                "text",
            )
        got = search_with_delta(spark, d, "t1", 300, "text")
        dup = sorted(round(s, 9) for p, s in got if p[0] == 777)
        assert len(dup) == 2 and dup[0] != dup[1]
        # expected: each row scored separately with sealed stats
        want = sorted(round(s, 9) for s in _score_each(oracle, texts, ["t1"]))
        assert dup == want
        vacuum(spark, d, "text")
        got = search_with_delta(spark, d, "t1", 300, "text")
        assert sum(1 for p, _ in got if p[0] == 777) == 2

    def test_open_index_survives_vacuum(self, spark, lifecycle):
        """Versioned publish: a Bm25Index opened before a vacuum keeps
        answering queries from the retired generation (its files stay
        on disk until gc_index's grace elapses); a fresh open sees the
        new generation."""
        d, oracle, rnd = lifecycle
        old_idx = Bm25Index(spark, d)
        before = old_idx.search("t1 t2", 10)
        insert(
            spark,
            d,
            spark.createDataFrame([(4242, "t1 t1 t2")], "doc_id INT, text STRING"),
            "text",
        )
        vacuum(spark, d, "text")
        # the pre-vacuum handle still reads its own (old) generation
        assert old_idx.search("t1 t2", 10) == before
        assert old_idx.docs_df().count() == old_idx.n_docs
        # a fresh handle sees the compacted generation
        new_idx = Bm25Index(spark, d)
        assert new_idx.n_docs == old_idx.n_docs + 1
        assert new_idx.meta["generation"] == 1
        assert new_idx.meta["paths"]["docs"].startswith("gen1/")

    def test_gc_reclaims_retired_generation(self, spark, lifecycle):
        import os

        from bm25spark.maintain import gc_index

        d, oracle, rnd = lifecycle
        insert(
            spark,
            d,
            spark.createDataFrame([(5000, "t1 t3")], "doc_id INT, text STRING"),
            "text",
        )
        vacuum(spark, d, "text")
        # retired gen-0 dirs still on disk for concurrent readers
        assert os.path.exists(os.path.join(d, "docs"))
        # grace not elapsed -> nothing reclaimed
        assert gc_index(d, grace_sec=3600) is False
        assert os.path.exists(os.path.join(d, "docs"))
        assert gc_index(d, grace_sec=0) is True
        assert not os.path.exists(os.path.join(d, "docs"))
        assert not os.path.exists(os.path.join(d, "postings"))
        # gen1 alive and well
        idx = Bm25Index(spark, d)
        assert idx.search("t1", 5)
        # second vacuum retires gen1, publishes gen2
        vacuum(spark, d, "text")
        idx2 = Bm25Index(spark, d)
        assert idx2.meta["generation"] == 2
        assert os.path.exists(os.path.join(d, "gen1"))
        gc_index(d, grace_sec=0)
        assert not os.path.exists(os.path.join(d, "gen1"))
        assert idx2.search("t1", 5)

    def test_back_to_back_vacuums_carry_retired_paths(self, spark, lifecycle):
        """Two vacuums inside the grace window must not orphan the
        grandparent generation: the unreclaimed retired paths carry
        forward into the new retired set, and one gc reclaims all."""
        import os

        from bm25spark.maintain import gc_index

        d, oracle, rnd = lifecycle
        os.environ["BM25SPARK_VACUUM_GRACE_SEC"] = "3600"
        try:
            vacuum(spark, d, "text")   # gen0 retired (grace not elapsed)
            vacuum(spark, d, "text")   # gen1 retired; gen0 must carry
            import json

            with open(os.path.join(d, "meta.json")) as f:
                meta = json.load(f)
            entries = meta["retired"]["entries"]
            assert "docs" in entries     # gen0 legacy dirs
            assert "gen1" in entries
            # per-path timestamps: gen0's clock is OLDER than gen1's —
            # carrying forward must neither restart gen0's grace nor
            # shorten gen1's
            assert entries["docs"] <= entries["gen1"]
            assert os.path.exists(os.path.join(d, "docs"))
            assert os.path.exists(os.path.join(d, "gen1"))
        finally:
            del os.environ["BM25SPARK_VACUUM_GRACE_SEC"]
        assert gc_index(d, grace_sec=0) is True
        assert not os.path.exists(os.path.join(d, "docs"))
        assert not os.path.exists(os.path.join(d, "gen1"))
        assert Bm25Index(spark, d).search("t1", 5)

    def test_delete_hides_immediately_stats_stale(self, spark, lifecycle):
        d, oracle, rnd = lifecycle
        idx = Bm25Index(spark, d)
        n_before = idx.n_docs
        hits = search_with_delta(spark, d, "t1 t2", 10, "text")
        victim = hits[0][0][0]
        delete(spark, d, spark.createDataFrame([(victim,)], "doc_id INT"))
        oracle.delete(victim)
        after = search_with_delta(spark, d, "t1 t2", 10, "text")
        assert all(p[0] != victim for p, _ in after)
        _check(spark, d, oracle, rnd, "t1 t2")
        # stats unchanged until vacuum
        assert Bm25Index(spark, d).n_docs == n_before
        vacuum(spark, d, "text")
        oracle.vacuum()
        assert Bm25Index(spark, d).n_docs == n_before - 1
        _check(spark, d, oracle, rnd, "t1 t2")


class TestControlPlane:
    """The pyarrow.fs seam (VERDICT r3 #2) + single-writer enforcement
    (VERDICT r3 #4)."""

    def test_file_uri_lifecycle(self, spark, tmp_path):
        """Full build → search → insert → delete → delta-search →
        vacuum → gc lifecycle with the index addressed by a filesystem
        URI instead of a POSIX path — proof the control plane (meta,
        _SUCCESS probes, publish, GC, sequence counter) goes through
        pyarrow.fs, so an object-store index_dir is honest."""
        from bm25spark import fs as fsio
        from bm25spark.maintain import gc_index

        rnd = random.Random(3)
        rows = [_mkdoc(rnd, i) for i in range(120)]
        d = "file://" + str(tmp_path / "uri_idx")
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        build_index(
            spark, df, d, "text", ["doc_id"], cfg=Bm25Config(shard_size=128)
        )
        idx = Bm25Index(spark, d)
        assert idx.n_docs == 120
        base_hits = idx.search("t1 t2", 10)
        assert base_hits

        # distributed path over the URI too
        from bm25spark.distributed import search_distributed

        dist = search_distributed(spark, d, "t1 t2", 10, round_score=None)
        assert [r.doc_id for r in dist.collect()]

        insert(
            spark, d,
            spark.createDataFrame([(900, "t1 t1 t2")], "doc_id INT, text STRING"),
            "text",
        )
        delete(spark, d, spark.createDataFrame([(0,)], "doc_id INT"))
        assert delta_size(spark, d) == 1
        got = search_with_delta(spark, d, "t1 t2", 50, "text")
        assert any(p[0] == 900 for p, _ in got)
        assert all(p[0] != 0 for p, _ in got)

        vacuum(spark, d, "text")
        idx2 = Bm25Index(spark, d)
        assert idx2.meta["generation"] == 1 and idx2.n_docs == 120
        assert fsio.exists(fsio.join(d, "mut_gen0"))  # retired, pre-gc
        assert gc_index(d, grace_sec=0) is True
        assert not fsio.exists(fsio.join(d, "mut_gen0"))
        assert not fsio.exists(fsio.join(d, "docs"))
        assert Bm25Index(spark, d).search("t1", 5)

    def test_concurrent_inserts_mint_distinct_seqs(self, spark, lifecycle):
        """Two concurrent insert() drivers must not mint the same
        mutation sequence (the old read-modify-write counter could;
        the reference's fuzz runs multithreaded mutators,
        tests/fuzz:217-303)."""
        from concurrent.futures import ThreadPoolExecutor

        from bm25spark.maintain import _delta_path

        d, oracle, rnd = lifecycle

        def ins(i):
            insert(
                spark, d,
                spark.createDataFrame(
                    [(7000 + i, f"t1 t{i}")], "doc_id INT, text STRING"
                ),
                "text",
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(ins, i) for i in range(2)]:
                f.result()
        seqs = [
            r._seq
            for r in spark.read.parquet(_delta_path(d, 0)).select("_seq").collect()
        ]
        assert len(seqs) == 2 and len(set(seqs)) == 2, seqs
        assert delta_size(spark, d) == 2

    def test_mutator_blocked_while_lock_held(self, spark, lifecycle, monkeypatch):
        """An insert racing a vacuum fails loudly instead of writing
        into a growing segment mid-absorb: vacuum holds the mutation
        lock for its whole run, and a waiting mutator times out with a
        clear error."""
        from bm25spark.maintain import _MutationLock

        d, oracle, rnd = lifecycle
        monkeypatch.setenv("BM25SPARK_LOCK_TIMEOUT_SEC", "0.3")
        with _MutationLock(d, timeout=60):
            with pytest.raises(TimeoutError, match="mutation lock"):
                insert(
                    spark, d,
                    spark.createDataFrame([(1, "t1")], "doc_id INT, text STRING"),
                    "text",
                )
        # lock released -> insert proceeds
        insert(
            spark, d,
            spark.createDataFrame([(8000, "t1")], "doc_id INT, text STRING"),
            "text",
        )
        assert delta_size(spark, d) == 1

    def test_no_double_visibility_after_vacuum(self, spark, lifecycle):
        """Generation-scoped growing segment: after a vacuum publishes
        gen N+1, a newly opened delta-aware search reads the (empty)
        mut_gen{N+1} — the absorbed delta rows appear exactly once (the
        old layout deleted the delta AFTER the meta repoint, so a new
        reader in that window saw them twice). The absorbed mut dir
        survives for pre-vacuum readers until gc."""
        import os

        d, oracle, rnd = lifecycle
        insert(
            spark, d,
            spark.createDataFrame(
                [(9000, "t1 t1 t1 t2")], "doc_id INT, text STRING"
            ),
            "text",
        )
        vacuum(spark, d, "text")
        # absorbed growing segment still on disk (old readers), but the
        # new generation's delta view is empty
        assert os.path.exists(os.path.join(d, "mut_gen0"))
        assert delta_size(spark, d) == 0
        got = search_with_delta(spark, d, "t1 t2", 50, "text")
        ids = [p[0] for p, _ in got]
        assert ids.count(9000) == 1  # exactly once — no double count
        # sealed-only view of the new generation agrees exactly
        idx = Bm25Index(spark, d)
        pay = {
            r.doc_id: r.p_doc_id
            for r in idx.docs_df().select("doc_id", "p_doc_id").collect()
        }
        sealed = [(pay[i], round(s, 9)) for i, s in idx.search("t1 t2", 50)]
        assert sorted(sealed) == sorted((p[0], round(s, 9)) for p, s in got)


class TestDeltaBatch:
    def test_batch_equals_single_delta_search(self, spark, lifecycle):
        """search_with_delta_batch_df answers M queries against a
        mutated index (inserts + deletes live) with per-query rows
        identical to M search_with_delta_df calls — including an
        all-absent query (no rows) and a query matching only delta
        docs."""
        from bm25spark.maintain import search_with_delta_batch_df, search_with_delta_df

        d, oracle, rnd = lifecycle
        insert(
            spark, d,
            spark.createDataFrame(
                [(900, "t1 t1 zonly"), (901, "t2 zonly zonly")],
                "doc_id INT, text STRING",
            ),
            "text",
        )
        delete(spark, d, spark.createDataFrame([(3,), (6,)], "doc_id INT"))
        qs = {
            "a": "t1 t2",
            "b": "t5",
            "c": "zz_absent qq_absent",
            "d": "t1 t250 t7",
        }
        batch = search_with_delta_batch_df(spark, d, qs, 25, "text").collect()
        by_q: dict = {}
        for r in batch:
            by_q.setdefault(r.query_id, []).append(
                (r.p_doc_id if hasattr(r, "p_doc_id") else r.doc_id, r.score)
            )
        for qid, text in qs.items():
            single = [
                (r.doc_id, r.score)
                for r in search_with_delta_df(
                    spark, d, text, 25, "text"
                ).collect()
            ]
            assert by_q.get(qid, []) == single, qid


class TestControlPlaneHardening:
    """Round-4 review fixes: per-path GC grace, meta-under-lock,
    legacy mutation-layout fallback."""

    def test_per_path_grace_not_shortened(self, spark, lifecycle):
        """A generation retired INSIDE an older generation's elapsed
        grace window keeps its own full window: gc with a grace that
        has elapsed for gen0 but not gen1 reclaims ONLY gen0 (the old
        single-timestamp carry deleted gen1 11 seconds after
        retirement in the judge's scenario)."""
        import json
        import os
        import time

        from bm25spark.maintain import gc_index

        d, oracle, rnd = lifecycle
        vacuum(spark, d, "text")  # retires gen0 dirs at t0
        # age gen0's entries far into the past so ITS grace elapsed
        mp = os.path.join(d, "meta.json")
        with open(mp) as f:
            meta = json.load(f)
        meta["retired"]["entries"] = {
            k: v - 10_000 for k, v in meta["retired"]["entries"].items()
        }
        with open(mp, "w") as f:
            json.dump(meta, f)
        # grace high during the vacuum so its in-body gc keeps BOTH
        # generations (otherwise it would rightly reclaim aged gen0)
        os.environ["BM25SPARK_VACUUM_GRACE_SEC"] = "100000"
        try:
            vacuum(spark, d, "text")  # retires gen1 at t_now; carries gen0
        finally:
            del os.environ["BM25SPARK_VACUUM_GRACE_SEC"]
        assert gc_index(d, grace_sec=3600) is True  # gen0 reclaimed
        assert not os.path.exists(os.path.join(d, "docs"))
        # gen1 retired seconds ago -> still inside ITS 3600s grace
        assert os.path.exists(os.path.join(d, "gen1"))
        with open(mp) as f:
            meta = json.load(f)
        assert "gen1" in meta["retired"]["entries"]
        # and its timestamp is recent, not inherited from gen0
        assert time.time() - meta["retired"]["entries"]["gen1"] < 600
        assert gc_index(d, grace_sec=0) is True
        assert not os.path.exists(os.path.join(d, "gen1"))

    def test_mutator_queued_behind_vacuum_sees_new_generation(
        self, spark, lifecycle
    ):
        """insert() reads meta UNDER the mutation lock: rows inserted
        right after a vacuum land in the new generation's growing
        segment (the pre-fix read-before-lock would write them into
        the retired mut dir, silently losing them at gc)."""
        import os

        from bm25spark.maintain import gc_index

        d, oracle, rnd = lifecycle
        vacuum(spark, d, "text")
        insert(
            spark, d,
            spark.createDataFrame([(12345, "t1 t1")], "doc_id INT, text STRING"),
            "text",
        )
        assert os.path.exists(os.path.join(d, "mut_gen1", "delta"))
        gc_index(d, grace_sec=0)  # reclaims gen0 + mut_gen0
        # the inserted row survived the gc and is searchable
        got = search_with_delta(spark, d, "t1", 500, "text")
        assert any(p[0] == 12345 for p, _ in got)

    def test_legacy_root_mutation_layout_still_honored(self, spark, lifecycle):
        """An index mutated by the pre-generation-scoped layout (delta/
        tombstones/ at the index root) keeps its pending mutations:
        readers resolve to the legacy dirs, new mutations append there,
        and vacuum absorbs + retires them."""
        import os
        import shutil

        d, oracle, rnd = lifecycle
        insert(
            spark, d,
            spark.createDataFrame([(7777, "t1 t9")], "doc_id INT, text STRING"),
            "text",
        )
        delete(spark, d, spark.createDataFrame([(0,)], "doc_id INT"))
        # simulate the old layout: move mut_gen0/* to the index root
        mg = os.path.join(d, "mut_gen0")
        for name in os.listdir(mg):
            shutil.move(os.path.join(mg, name), os.path.join(d, name))
        os.rmdir(mg)

        assert delta_size(spark, d) == 1  # reader sees the legacy delta
        got = search_with_delta(spark, d, "t1", 500, "text")
        assert any(p[0] == 7777 for p, _ in got)
        assert all(p[0] != 0 for p, _ in got)  # legacy tombstone honored

        # a NEW mutation appends into the legacy location (consistent)
        insert(
            spark, d,
            spark.createDataFrame([(7778, "t1")], "doc_id INT, text STRING"),
            "text",
        )
        assert delta_size(spark, d) == 2
        assert not os.path.exists(os.path.join(d, "mut_gen0", "delta"))

        vacuum(spark, d, "text")
        idx = Bm25Index(spark, d)
        assert idx.meta["generation"] == 1
        # legacy dirs retired with the generation; gc reclaims them
        from bm25spark.maintain import gc_index

        gc_index(d, grace_sec=0)
        for name in ("delta", "tombstones", "delta_tombstones", "delta_seq"):
            assert not os.path.exists(os.path.join(d, name)), name
        got = search_with_delta(spark, d, "t1", 500, "text")
        assert any(p[0] == 7777 for p, _ in got)
        assert all(p[0] != 0 for p, _ in got)


def test_delta_search_prefilter_composes(spark, lifecycle):
    """P3 ∘ O6: a payload-key prefilter restricts BOTH segments of the
    growing∪sealed search (sealed leg per-shard mask alongside the
    tombstone blocklist; delta leg semi-join), with sealed statistics
    untouched."""
    from bm25spark.maintain import search_with_delta_df

    d, oracle, rnd = lifecycle
    insert(
        spark, d,
        spark.createDataFrame(
            [(1000, "t1 t1 t1 t1"), (1001, "t1 t1 t1 t1")],
            "doc_id INT, text STRING",
        ),
        "text",
    )
    delete(spark, d, spark.createDataFrame([(2,)], "doc_id INT")) 
    allowed = spark.createDataFrame(
        [(i,) for i in range(0, 1002, 2)], "doc_id INT"
    )
    got = search_with_delta_df(
        spark, d, "t1", 500, "text", prefilter=allowed
    ).collect()
    ids = [r.doc_id for r in got]
    assert ids, "prefiltered delta search returned nothing"
    assert all(i % 2 == 0 for i in ids)          # prefilter on both legs
    assert 1000 in ids and 1001 not in ids       # delta leg filtered
    assert 2 not in ids                          # tombstone still applies
    # unprefiltered search agrees on the allowed subset (stats equal)
    full = {
        r.doc_id: r.score
        for r in search_with_delta_df(spark, d, "t1", 2000, "text").collect()
    }
    for r in got:
        assert full[r.doc_id] == r.score, r.doc_id


def test_delta_batch_prefilter_parity(spark, lifecycle):
    """The last cell of the serving matrix (batch × delta ×
    tombstone+prefilter): search_with_delta_batch_df with BOTH a
    tombstone set and a payload-key prefilter live returns per-query
    rows identical to M single search_with_delta_df calls under the
    same constraints."""
    from bm25spark.maintain import (
        search_with_delta_batch_df,
        search_with_delta_df,
    )

    d, oracle, rnd = lifecycle
    insert(
        spark, d,
        spark.createDataFrame(
            [(1000, "t1 t1 t2"), (1001, "t1 t1 t2"), (1002, "t5 t5")],
            "doc_id INT, text STRING",
        ),
        "text",
    )
    delete(spark, d, spark.createDataFrame([(2,), (4,)], "doc_id INT"))
    allowed = spark.createDataFrame(
        [(i,) for i in range(0, 1004, 2)], "doc_id INT"
    )
    qs = {"a": "t1 t2", "b": "t5", "c": "zz_absent"}
    batch = search_with_delta_batch_df(
        spark, d, qs, 25, "text", prefilter=allowed
    ).collect()
    by_q: dict = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    assert by_q, "batch returned nothing"
    for rows in by_q.values():
        assert all(i % 2 == 0 for i, _ in rows)
        assert all(i not in (2, 4) for i, _ in rows)
    for qid, text in qs.items():
        single = [
            (r.doc_id, r.score)
            for r in search_with_delta_df(
                spark, d, text, 25, "text", prefilter=allowed
            ).collect()
        ]
        assert by_q.get(qid, []) == single, qid


class TestLockHardening:
    """Round-5 lock work: loud non-local no-op, heartbeat vs stale
    steal, steal hygiene (no litter), publish-gate assert_held, and
    retrying GC."""

    def test_nonlocal_mutation_is_loud(self, tmp_path, monkeypatch):
        from bm25spark import fs as fsio
        from bm25spark.maintain import _MutationLock

        real_is_local = fsio.is_local
        monkeypatch.setattr(
            fsio, "is_local", lambda p: False if "fakestore" in p else real_is_local(p)
        )
        monkeypatch.delenv("BM25SPARK_SINGLE_WRITER", raising=False)
        with pytest.raises(RuntimeError, match="BM25SPARK_SINGLE_WRITER"):
            _MutationLock(str(tmp_path / "fakestore_idx"))
        # explicit single-writer acknowledgement -> documented no-op
        monkeypatch.setenv("BM25SPARK_SINGLE_WRITER", "1")
        lk = _MutationLock(str(tmp_path / "fakestore_idx"))
        assert lk.enabled is False
        with lk:
            lk.assert_held()  # no-op when disabled

    def test_lease_acquire_contend_release(self, monkeypatch):
        """Conditional-write lease on a mock object store: acquire is
        put-if-absent, a second mutator times out while the lease is
        held, release is compare-and-delete, and the lock becomes
        acquirable again."""
        import json as _json

        from bm25spark import fs as fsio
        from bm25spark.maintain import _MutationLock

        store = fsio.InMemoryConditionalStore()
        fsio.register_lease_store("mock", lambda: store)
        try:
            a = _MutationLock("mock://bucket/idx")
            assert a.enabled and a.store is store
            with a:
                a.assert_held()
                body = _json.loads(store.get(a.path)[0])
                assert body["token"] == a.token
                b = _MutationLock("mock://bucket/idx", timeout=0.3)
                with pytest.raises(TimeoutError, match="lease"):
                    b.__enter__()
            assert store.get(a.path) is None  # released
            with _MutationLock("mock://bucket/idx", timeout=1) as c:
                c.assert_held()
        finally:
            fsio.unregister_lease_store("mock")

    def test_lease_stale_steal_and_publish_gate(self, monkeypatch):
        """A lease whose embedded ts is older than stale is stolen by
        version-CAS; the stolen-from holder fails assert_held (publish
        gate) and its release leaves the stealer's lease intact — the
        object-store mirror of the local rename-aside protocol."""
        import json as _json

        from bm25spark import fs as fsio
        from bm25spark.maintain import _MutationLock

        store = fsio.InMemoryConditionalStore()
        fsio.register_lease_store("mock", lambda: store)
        try:
            a = _MutationLock("mock://bucket/idx")  # stale default 1h
            a.__enter__()
            try:
                # age A's lease body past B's stale window (the mock
                # analogue of utime-ing the local lockfile backwards)
                data, ver = store.get(a.path)
                d = _json.loads(data)
                d["ts"] -= 10.0
                assert store.put_if_match(
                    a.path, _json.dumps(d).encode(), ver
                )
                monkeypatch.setenv("BM25SPARK_LOCK_STALE_SEC", "5")
                b = _MutationLock("mock://bucket/idx", timeout=5)
                b.__enter__()
                try:
                    b.assert_held()
                    with pytest.raises(RuntimeError, match="lock .* lost"):
                        a.assert_held()  # stolen-from holder must abort
                    # A's release must NOT remove B's lease
                    a.__exit__(None, None, None)
                    b.assert_held()
                finally:
                    b.__exit__(None, None, None)
                assert store.get(b.path) is None
            finally:
                a.__exit__(None, None, None)
        finally:
            fsio.unregister_lease_store("mock")

    def test_lease_heartbeat_prevents_steal(self, monkeypatch):
        """A live holder's heartbeat (version-CAS ts refresh every
        stale/4) keeps the lease fresh: a waiter sees a never-stale
        lease and times out instead of stealing."""
        import json as _json

        from bm25spark import fs as fsio
        from bm25spark.maintain import _MutationLock

        store = fsio.InMemoryConditionalStore()
        fsio.register_lease_store("mock", lambda: store)
        monkeypatch.setenv("BM25SPARK_LOCK_STALE_SEC", "4")
        try:
            a = _MutationLock("mock://bucket/idx")
            a.__enter__()
            try:
                ts0 = _json.loads(store.get(a.path)[0])["ts"]
                # poll for the refresh (interval = stale/4 = 1 s) with
                # a generous deadline so a scheduler stall on a noisy
                # VM can't flake the assertion
                deadline = time.monotonic() + 20.0
                ts1 = ts0
                while ts1 <= ts0 and time.monotonic() < deadline:
                    time.sleep(0.2)
                    ts1 = _json.loads(store.get(a.path)[0])["ts"]
                assert ts1 > ts0  # refreshed by the heartbeat thread
                b = _MutationLock("mock://bucket/idx", timeout=1.5)
                with pytest.raises(TimeoutError):
                    b.__enter__()
                a.assert_held()  # never displaced
            finally:
                a.__exit__(None, None, None)
        finally:
            fsio.unregister_lease_store("mock")

    def test_lease_mutual_exclusion_under_contention(self, monkeypatch):
        """N threads hammering acquire/release on one lease: the
        critical section is never concurrently occupied and every
        thread eventually gets through (CAS liveness)."""
        import threading

        from bm25spark import fs as fsio
        from bm25spark.maintain import _MutationLock

        store = fsio.InMemoryConditionalStore()
        fsio.register_lease_store("mock", lambda: store)
        try:
            inside = []
            overlap = []
            done = []

            def worker(i):
                for _ in range(5):
                    with _MutationLock("mock://bucket/idx", timeout=30):
                        inside.append(i)
                        if len(inside) > 1:
                            overlap.append(tuple(inside))
                        time.sleep(0.002)
                        inside.pop()
                done.append(i)

            ts = [
                threading.Thread(target=worker, args=(i,)) for i in range(4)
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join(60)
            assert overlap == []
            assert sorted(done) == [0, 1, 2, 3]
        finally:
            fsio.unregister_lease_store("mock")

    def test_stale_steal_no_litter_and_publish_gate(
        self, tmp_path, monkeypatch
    ):
        import glob
        import os as _os

        from bm25spark.maintain import _MutationLock

        d = str(tmp_path)
        a = _MutationLock(d)  # default stale (1h): heartbeat idle here
        a.__enter__()
        try:
            # age the lockfile past B's stale window
            old = _os.stat(a.path).st_mtime - 10.0
            _os.utime(a.path, (old, old))
            monkeypatch.setenv("BM25SPARK_LOCK_STALE_SEC", "5")
            b = _MutationLock(d, timeout=5)
            b.__enter__()
            try:
                # steal succeeded, no .mutlock.stale.* litter remains
                assert glob.glob(_os.path.join(d, ".mutlock.stale.*")) == []
                b.assert_held()
                with pytest.raises(RuntimeError, match="lock .* lost"):
                    a.assert_held()  # stolen-from holder must abort
            finally:
                b.__exit__(None, None, None)
            # B's release removed the lock; A's release must not crash
            # (and must not delete anything it doesn't own)
        finally:
            a.__exit__(None, None, None)
        assert not _os.path.exists(a.path)

    def test_exit_leaves_stealers_lock_intact(self, tmp_path, monkeypatch):
        import os as _os

        from bm25spark.maintain import _MutationLock

        d = str(tmp_path)
        a = _MutationLock(d)
        a.__enter__()
        old = _os.stat(a.path).st_mtime - 10.0
        _os.utime(a.path, (old, old))
        monkeypatch.setenv("BM25SPARK_LOCK_STALE_SEC", "5")
        b = _MutationLock(d, timeout=5)
        b.__enter__()
        # A releases while B holds: compare-and-unlink must restore
        # B's lockfile, not delete it
        a.__exit__(None, None, None)
        assert _os.path.exists(b.path)
        b.assert_held()
        b.__exit__(None, None, None)
        assert not _os.path.exists(b.path)

    def test_gc_keeps_refused_and_failed_entries(
        self, spark, tmp_path, monkeypatch
    ):
        import json

        from bm25spark import fs as fsio
        from bm25spark.maintain import _retired_entries, gc_index

        rnd = random.Random(5)
        rows = [_mkdoc(rnd, i) for i in range(40)]
        d = str(tmp_path / "idx")
        build_index(
            spark,
            spark.createDataFrame(rows, "doc_id INT, text STRING"),
            d, "text", ["doc_id"], cfg=Bm25Config(shard_size=128),
        )
        import os as _os

        _os.makedirs(_os.path.join(d, "oldgen"), exist_ok=True)
        mp = fsio.join(d, "meta.json")
        meta = json.loads(fsio.read_text(mp))
        meta["retired"] = {
            "entries": {"oldgen": 1.0, "evil/../escape": 1.0}
        }
        fsio.write_text_atomic(mp, json.dumps(meta))

        # maintain.fsio IS this module object, so patching here patches
        # the gc call path too
        real_rmtree = fsio.rmtree
        monkeypatch.setattr(
            fsio,
            "rmtree",
            lambda p: False if p.endswith("oldgen") else real_rmtree(p),
        )
        assert gc_index(d, grace_sec=0) is False  # nothing reclaimed
        meta2 = json.loads(fsio.read_text(mp))
        ent = _retired_entries(meta2)
        # failed delete AND refused name both survive for retry/audit
        assert "oldgen" in ent and "evil/../escape" in ent
        # fs back to normal -> the failed entry is reclaimed on retry
        monkeypatch.undo()
        assert gc_index(d, grace_sec=0) is True
        ent3 = _retired_entries(json.loads(fsio.read_text(mp)))
        assert "oldgen" not in ent3 and "evil/../escape" in ent3


class TestLockLitterRaces:
    """The gc litter sweep must never race a live release (review
    finding): fresh .rel/.stale files are age-gated, and __exit__
    survives a racer deleting its rename-aside file mid-release."""

    def test_gc_sweep_is_age_gated(self, tmp_path):
        import json as _json
        import os as _os
        import time as _time

        from bm25spark.maintain import gc_index

        d = str(tmp_path)
        with open(_os.path.join(d, "meta.json"), "w") as f:
            _json.dump({}, f)
        fresh = _os.path.join(d, ".mutlock.rel.111")
        aged = _os.path.join(d, ".mutlock.stale.222")
        for p in (fresh, aged):
            with open(p, "w") as f:
                f.write("tok")
        old = _time.time() - 120.0
        _os.utime(aged, (old, old))
        gc_index(d)
        assert _os.path.exists(fresh)       # live release in flight
        assert not _os.path.exists(aged)    # crashed-steal litter

    def test_release_survives_concurrent_sweep(self, tmp_path):
        import os as _os

        from bm25spark.maintain import _MutationLock

        d = str(tmp_path)
        a = _MutationLock(d)
        a.__enter__()
        orig = a._read_token

        def read_and_sweep(path):
            tok = orig(path)
            if ".rel." in path and _os.path.exists(path):
                _os.unlink(path)  # a gc sweep wins the race
            return tok

        a._read_token = read_and_sweep
        a.__exit__(None, None, None)  # must not raise
        assert not _os.path.exists(a.path)
