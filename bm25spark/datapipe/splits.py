"""Deterministic dataset split assignment — the train/val/test (or
shard/fold) bucketing step every training-data build runs last. Hash,
don't sample: `rand()`-based splits are irreproducible across retries
and cluster sizes, while a salted content-independent hash of the
stable key gives every row a permanent split that survives reruns,
backfills, and repartitioning (and changing the salt re-draws the
whole assignment, e.g. for cross-validation folds).

bucket = first 8 hex chars of md5(doc_id || '|' || salt) mod 1e6 —
the same md5 primitive every dedup operator here uses, identical in
Spark (`conv(substring(md5(...)))`) and DuckDB (`('0x' ||
substr(md5(...)))::BIGINT`), so the assignment is exactly
oracle-checkable. Pure narrow Catalyst expressions: no shuffle, no
action — the cheapest operator in the pipeline, by design, because
it runs over the full 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000
DEFAULT_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("train", 0.98),
    ("val", 0.01),
    ("test", 0.01),
)
DEFAULT_SALT = "bm25spark"


def _thresholds(
    weights: tuple[tuple[str, float], ...],
) -> list[tuple[str, int]]:
    total = sum(w for _, w in weights)
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name, w in weights:
        if w <= 0:
            raise ValueError(f"split weight for {name!r} must be > 0")
        cum += w
        out.append((name, round(cum * _SCALE)))
    out[-1] = (out[-1][0], _SCALE)  # absorb float residue
    # a weight below the bucket resolution (or a rounding tie) would
    # make its split silently unreachable — refuse instead
    prev = 0
    for name, thr in out:
        if thr <= prev:
            raise ValueError(
                f"split {name!r} is unreachable: weight below the "
                f"1/{_SCALE} bucket resolution (threshold {thr} after "
                f"{prev})"
            )
        prev = thr
    return out


def split_assign(
    docs: DataFrame,
    weights: tuple[tuple[str, float], ...] = DEFAULT_WEIGHTS,
    salt: str = DEFAULT_SALT,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, split) ordered by doc_id: bucket ∈ [0, 1e6)
    from the salted md5 of the id, split = the first weight whose
    cumulative threshold exceeds the bucket."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"), F.lit("|" + salt)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _SCALE
    )
    expr = None
    for name, thr in _thresholds(weights):
        cond = F.col("bucket") < thr
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    return (
        docs.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            bucket.alias("bucket"),
        )
        .select("doc_id", "bucket", expr.alias("split"))
        .orderBy("doc_id")
    )


def split_assign_sql(
    weights: tuple[tuple[str, float], ...] = DEFAULT_WEIGHTS,
    salt: str = DEFAULT_SALT,
) -> str:
    whens = "\n         ".join(
        f"WHEN bucket < {thr} THEN '{name}'"
        for name, thr in _thresholds(weights)
    )
    return f"""
WITH b AS (
  SELECT doc_id::BIGINT AS doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || '|{salt}'), 1, 8))::BIGINT
           % {_SCALE} AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE {whens} END AS split
FROM b ORDER BY doc_id
"""
