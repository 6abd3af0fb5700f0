"""Shared datapipe plumbing.

:func:`spread_small_scan` — scale-adaptive input spreading (guide
§2.5 "input skew": one huge unsplittable file). The bench/gate corpora
are single parquet files with a single row group, so every narrow
per-document stage (tokenize, shingle, hash, regex) otherwise runs in
ONE scan task no matter how many cores the session has. Repartitioning
costs one shuffle of the raw rows — trivial against the per-row work
these operators do — and is a no-op whenever the scan already has at
least ``defaultParallelism`` partitions (any real multi-file table at
scale), so it is NOT a local-mode constant: it derives from the actual
scan split count vs the cluster's parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism when its physical scan has fewer partitions. Safe for
    any partitioning-independent pipeline (every gated operator ends in
    a global order/aggregation); Spark's sort-before-repartition keeps
    the row->partition assignment deterministic under task retry."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < target:
        return df.repartition(target)
    return df
