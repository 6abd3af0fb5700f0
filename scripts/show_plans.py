#!/usr/bin/env python
"""Print the physical plans PLANS.md documents (run from repo root)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bm25spark.analyze import intern_str
from bm25spark.api import index_for_parquet
from bm25spark.datapipe.dedup import minhash_signatures
from bm25spark.query import exact_topk
from bm25spark.session import get_spark


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("show-plans", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    print("==== exact_topk ====")
    exact_topk(spark, docs, "text", "doc_id", "merge spark window", 10).explain(
        "formatted"
    )

    print("==== pruned postings read ====")
    idx = index_for_parquet(spark, f"{sf}/documents.parquet", "text", ["doc_id"])
    keys = [bytearray(intern_str(idx.seed, t)) for t in ("merge", "spark")]
    buckets = idx._buckets([bytes(k) for k in keys])
    (
        idx.postings_df()
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term_key").isin(keys))
        .select("term_key", "shard", "min_doc", "max_doc")
        .explain("formatted")
    )

    print("==== minhash signatures ====")
    minhash_signatures(docs).explain("formatted")


if __name__ == "__main__":
    main()
