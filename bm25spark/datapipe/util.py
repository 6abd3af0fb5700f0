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

``min_bytes`` trades the repartition's fixed shuffle latency against
the per-row work it parallelizes: operators whose per-byte cost is
high (window hashing, shingle+md5 signatures, per-token stats) spread
tiny inputs profitably and use the small default; operators that are
cheap per byte (a tokenize feeding one aggregation, a vectorized ANN
scan) only win once the single-task scan would take meaningful time,
so they pass a larger floor (measured: at the 0.6 MB sf0.1 corpus the
extra shuffle COST those legs ~0.2 s, while at the driver's escalated
6 MB corpus it saves multiples of that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: default floor for compute-heavy per-row operators
SPREAD_MIN_BYTES = 128 << 10
#: floor for cheap-per-row scans (exact scorer tokenize, ANN kernels)
SPREAD_MIN_BYTES_LIGHT = 2 << 20


def spread_small_scan(
    df: DataFrame,
    min_partitions: int | None = None,
    min_bytes: int = SPREAD_MIN_BYTES,
) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism when its physical scan has fewer partitions AND its
    estimated input size is at least ``min_bytes``. Safe for any
    partitioning-independent pipeline (every gated operator ends in a
    global order/aggregation); Spark's sort-before-repartition keeps
    the row->partition assignment deterministic under task retry."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= target:
            return df
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    if size < min_bytes:
        return df
    return df.repartition(target)
