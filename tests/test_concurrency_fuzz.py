"""Two-process mutation fuzz — the analogue of the reference's
multithreaded insert/delete/vacuum/search fuzz
(/root/reference/tests/fuzz:217-303): two driver processes mutate ONE
index concurrently under the mutation lock while also searching it,
then the surviving state must rank-match a sequential replay of the
winning (lock-serialized) operation order.

The winning order is reconstructed from the commit positions the lock
hands out: insert/delete return their ``(generation, sequence)``;
vacuum returns the generation it published, and every generation-G
mutation precedes the vacuum that absorbed generation G, which
precedes every generation-G+1 mutation."""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

from bm25spark.build import build_index
from bm25spark.config import Bm25Config

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "fuzz_worker.py")

QUERIES = ["merge spark window", "the", "vector", "data table query batch"]


def _commit_key(ev: dict) -> tuple:
    if ev["op"] == "vacuum":
        # a vacuum publishing generation G+1 happens after every
        # (G, seq) mutation and before every (G+1, seq) mutation
        return (ev["gen_new"] - 1, math.inf)
    return (ev["gen"], ev["seq"])


def test_two_process_fuzz_rank_matches_sequential_replay(spark, tmp_path):
    docs = spark.read.parquet(SF_DOCS)
    live = str(tmp_path / "idx_live")
    build_index(
        spark, docs, live, "text", ["doc_id"],
        cfg=Bm25Config(shard_size=1 << 14),
    )

    env = dict(
        os.environ,
        BM25SPARK_LOCK_TIMEOUT_SEC="300",
        SPARK_GRAFT_CPUS="2",
    )
    logs = [str(tmp_path / f"fuzz_log_{s}.json") for s in (1, 2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, live, str(s), logs[s - 1], SF_DOCS, REPO],
            cwd=REPO,
            env=env,
        )
        for s in (1, 2)
    ]
    for p in procs:
        assert p.wait(timeout=900) == 0, "fuzz worker failed"

    events = []
    for lp in logs:
        with open(lp) as f:
            events.extend(json.load(f))
    assert events, "workers committed no mutations"
    keys = [_commit_key(e) for e in events]
    assert len(set(keys)) == len(keys), (
        f"two mutations shared a commit position — lock broken: {keys}"
    )
    events.sort(key=_commit_key)

    # sequential replay of the winning order onto a fresh identical base
    from fuzz_worker import delete_keys, insert_frame

    from bm25spark import maintain

    replay = str(tmp_path / "idx_replay")
    build_index(
        spark, docs, replay, "text", ["doc_id"],
        cfg=Bm25Config(shard_size=1 << 14),
    )
    for ev in events:
        if ev["op"] == "insert":
            maintain.insert(
                spark, replay, insert_frame(spark, docs, ev["base"]), "text"
            )
        elif ev["op"] in ("delete", "delete_delta"):
            maintain.delete(spark, replay, delete_keys(spark, docs, ev))
        else:
            maintain.vacuum(spark, replay, "text")

    for q in QUERIES:
        got = [
            (r.doc_id, r.score)
            for r in maintain.search_with_delta_df(
                spark, live, q, 20, "text"
            ).collect()
        ]
        want = [
            (r.doc_id, r.score)
            for r in maintain.search_with_delta_df(
                spark, replay, q, 20, "text"
            ).collect()
        ]
        assert got == want, f"rank mismatch on {q!r}: {got} != {want}"
