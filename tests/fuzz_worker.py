"""Concurrency-fuzz worker: one mutator *process* hammering a shared
index under the mutation lock — one "thread" of the two-process
analogue of the reference's multithreaded insert/delete/vacuum/search
fuzz (/root/reference/tests/fuzz:217-303, which leans on PostgreSQL
relation locks where we lean on _MutationLock).

Runs a deterministic-per-seed op sequence against ``index_dir`` and
logs every committed mutation's lock-serialized commit position —
``(generation, sequence)`` for insert/delete, the published generation
for vacuum — so the parent test can merge both workers' logs into the
winning global order and replay it sequentially.

Usage: python fuzz_worker.py INDEX_DIR SEED LOG_PATH DOCS_PARQUET REPO
"""

from __future__ import annotations

import json
import random
import sys


def op_sequence(seed: int, n_ops: int = 7) -> list[dict]:
    """The deterministic plan for one worker (shared with the replay:
    the parent re-derives payload frames from these descriptors)."""
    rng = random.Random(seed)
    plan: list[dict] = []
    bases: list[int] = []
    for i in range(n_ops):
        op = rng.choice(
            ["insert", "delete", "insert", "delete", "search", "vacuum"]
        )
        if op == "insert":
            base = 1_000_000 * seed + 1_000 * i
            bases.append(base)
            plan.append({"op": "insert", "base": base})
        elif op == "delete":
            if bases and rng.random() < 0.4:
                # tombstone half of one of our own earlier delta
                # batches (exercises sequence-stamped delta masking)
                plan.append({"op": "delete_delta", "base": rng.choice(bases)})
            else:
                mod = rng.choice([5, 7, 11])
                plan.append(
                    {"op": "delete", "mod": mod, "rem": rng.randrange(mod)}
                )
        else:
            plan.append({"op": op})
    return plan


def insert_frame(spark, docs, base: int):
    from pyspark.sql import functions as F

    return (
        docs.orderBy("doc_id")
        .limit(15)
        .select((F.col("doc_id") + F.lit(base)).alias("doc_id"), "text")
    )


def delete_keys(spark, docs, step: dict):
    from pyspark.sql import functions as F

    if step["op"] == "delete_delta":
        return (
            docs.orderBy("doc_id")
            .limit(15)
            .select((F.col("doc_id") + F.lit(step["base"])).alias("doc_id"))
            .filter(F.col("doc_id") % 2 == 0)
        )
    return docs.filter(
        F.col("doc_id") % step["mod"] == step["rem"]
    ).select("doc_id")


def main() -> None:
    index_dir, seed_s, log_path, docs_path, repo = sys.argv[1:6]
    sys.path.insert(0, repo)
    from bm25spark import maintain
    from bm25spark.session import get_spark

    seed = int(seed_s)
    spark = get_spark(f"bm25spark-fuzz-{seed}", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)
    events = []
    for step in op_sequence(seed):
        if step["op"] == "insert":
            gen, seq = maintain.insert(
                spark, index_dir, insert_frame(spark, docs, step["base"]), "text"
            )
            events.append({**step, "gen": gen, "seq": seq})
        elif step["op"] in ("delete", "delete_delta"):
            gen, seq = maintain.delete(
                spark, index_dir, delete_keys(spark, docs, step)
            )
            events.append({**step, "gen": gen, "seq": seq})
        elif step["op"] == "vacuum":
            gen_new = maintain.vacuum(spark, index_dir, "text")
            events.append({**step, "gen_new": gen_new})
        else:
            # readers take no lock: a search racing any mutation or a
            # vacuum publish must not crash (generation-scoped dirs +
            # atomic meta repoint)
            rows = maintain.search_with_delta_df(
                spark, index_dir, "merge spark window", 10, "text"
            ).collect()
            assert isinstance(rows, list)
    with open(log_path, "w") as f:
        json.dump(events, f)
    spark.stop()


if __name__ == "__main__":
    main()
