"""The build's two block-construction paths must emit identical
artifacts: the doc-grouped mapInArrow hot path (one compact row per
document through the shard shuffle) and the exploded-mappings
mapInPandas path (used by vacuum and stage-granular resume). A shard
contains complete (term, shard) groups under either clustering, so
postings/terms/lineage must match row-for-row.
"""

from __future__ import annotations

import os
import shutil

from bm25spark.build import build_index, finalize_index
from bm25spark.config import Bm25Config


def test_doc_grouped_and_mappings_paths_identical(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = Bm25Config(shard_size=128)  # several shards even at sf0.001

    new_dir = str(tmp_path / "new")
    build_index(spark, docs, new_dir, "text", ["doc_id"], cfg=cfg)

    # rebuild stages 2-5 from the staged mappings parquet (the
    # vacuum/resume entry) into a copy and compare artifacts
    old_dir = str(tmp_path / "old")
    shutil.copytree(new_dir, old_dir)
    for sub in ["postings", "terms", "lineage", "lineage_buckets"]:
        shutil.rmtree(os.path.join(old_dir, sub), ignore_errors=True)
    os.remove(os.path.join(old_dir, "meta.json"))
    finalize_index(spark, old_dir, cfg, ["doc_id"])

    for art in ["postings", "terms", "lineage", "lineage_buckets"]:
        a = spark.read.parquet(os.path.join(new_dir, art))
        b = spark.read.parquet(os.path.join(old_dir, art))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, art


def test_empty_and_all_null_corpus_lifecycle(spark, tmp_path):
    """CREATE INDEX on an empty table works in the reference and must
    work here: an empty (or all-NULL-text) corpus builds a loadable
    index whose searches return nothing, accepts inserts whose terms
    only become searchable after vacuum (empty sealed dictionary =
    nothing surfaces from the growing segment, search.rs:55-62), and
    vacuums into a working one-doc index."""
    from bm25spark.index import Bm25Index
    from bm25spark.maintain import insert, search_with_delta, vacuum

    cases = {
        "empty": [],
        "null": [(1, None), (2, None)],
    }
    for name, rows in cases.items():
        d = str(tmp_path / f"idx_{name}")
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        build_index(spark, df, d, "text", ["doc_id"], cfg=Bm25Config(shard_size=128))
        idx = Bm25Index(spark, d)
        assert idx.n_docs == 0
        assert idx.search("anything", 5) == []
        assert idx.search_df("anything", 5).collect() == []
        insert(
            spark,
            d,
            spark.createDataFrame([(10, "hello world")], "doc_id INT, text STRING"),
            "text",
        )
        # sealed dictionary is empty -> delta doc invisible until vacuum
        assert search_with_delta(spark, d, "hello", 5, "text") == []
        vacuum(spark, d, "text")
        idx = Bm25Index(spark, d)
        assert idx.n_docs == 1
        assert [doc for doc, _ in idx.search("hello", 5)] == [0]
