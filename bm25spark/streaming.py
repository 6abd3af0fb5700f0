"""Structured Streaming ingest — the streaming analogue of the
reference's transactional insert path (SURVEY.md §2.10: the reference
has no streaming; incremental ingest is insert + vacuum merge. The
idiomatic Spark analogue is a stream appending to the delta (growing)
segment with periodic compaction, which is exactly what this wires).

- :func:`stream_ingest` — any streaming DataFrame of documents ->
  ``foreachBatch`` append into an index's delta table. Searches see
  the new docs immediately (growing∪sealed union); ``vacuum`` seals
  them. Checkpointing comes from Structured Streaming itself.
- :func:`windowed_event_counts` — watermarked sliding-window counts
  over an event stream; written batch-equivalent so the same function
  serves ``spark.read`` (testable against a SQL oracle) and
  ``spark.readStream`` (append mode with late-data handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_ingest(
    stream_df: DataFrame,
    index_dir: str,
    text_col: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
    auto_seal_rows: int | None = None,
):
    """Append a streaming document source into the index's delta
    segment. Returns the StreamingQuery.

    ``auto_seal_rows``: when set, each micro-batch ends with the
    auto-seal check — if the live delta now exceeds the threshold, a
    vacuum compacts it into the sealed segment (the reference's
    ``bm25.segment_growing_max_page_size`` auto-seal, README.md:466).
    Search results are identical before/after the seal (tested); only
    the stale statistics refresh."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        from .maintain import insert, maybe_vacuum

        insert(spark, index_dir, batch_df, text_col)
        if auto_seal_rows is not None:
            maybe_vacuum(spark, index_dir, text_col, max_delta_rows=auto_seal_rows)

    writer = (
        stream_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(event_type, window) counts + value sums. Works on both a
    batch DataFrame and a streaming one (watermark applies only when
    streaming)."""
    if events.isStreaming:
        # watermarks need TIMESTAMP (tz); parquet event time is NTZ
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
        events = events.withWatermark("ts", watermark)
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_GAP_MINUTES = 30
_SESSION_SCHEMA = (
    "user_id bigint, session_no bigint, start_ts timestamp, "
    "end_ts timestamp, n_events bigint, sum_value double"
)


def sessionize_events(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Per-user sessions with an inactivity gap — the batch
    (gaps-and-islands) form: lag over (user, time) marks session
    starts, a running sum numbers them, one aggregation per session.
    Two shuffles on user_id (window + groupBy share the key, so AQE
    reuses the exchange). Microsecond-precision gap comparison so the
    DuckDB oracle agrees on boundary events."""
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "ts",
        "event_id",
        "value",
        # parquet event time is TIMESTAMP_NTZ; the session runs UTC so
        # the cast is epoch-preserving (same micros DuckDB's epoch_us
        # sees)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("_us"),
    ).withColumn(
        "is_new",
        F.when(
            F.lag("_us").over(w).isNull()
            | (F.col("_us") - F.lag("_us").over(w) > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("user_id", "session_no")
    )


def sessionize_events_sql(gap_minutes: int = SESSION_GAP_MINUTES) -> str:
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_us
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_us IS NULL
                   OR epoch_us(ts) - prev_us > {gap_us}
                 THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
numbered AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id::BIGINT AS user_id, session_no::BIGINT AS session_no,
       min(ts) AS start_ts, max(ts) AS end_ts,
       count(*)::BIGINT AS n_events, round(sum(value), 4) AS sum_value
FROM numbered GROUP BY 1, 2 ORDER BY 1, 2
"""


def sessionize_stream(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """The stateful-streaming form: ``applyInPandasWithState`` keeps
    one open session per user across micro-batches and emits a session
    only when a later event closes it (gap exceeded). State is the
    open session's (start_us, last_us, n, sum) — O(1) per user, the
    custom-stateful-operator pattern the batch engine cannot express.
    Closed sessions equal the batch form's non-final sessions (tested);
    numbers are assigned per emission order within a user."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    state_schema = "start_us long, last_us long, n long, s double, emitted long"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(["ts", "event_id"])
        # convert from the actual dtype (pandas may deliver ns- or
        # us-unit datetime64 depending on the Arrow schema) — never
        # guess the unit from the magnitude
        us = (
            pd.to_datetime(rows["ts"])
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()
        )
        vals = rows["value"].to_numpy()
        if state.exists:
            start_us, last_us, n, s, emitted = state.get
        else:
            start_us, last_us, n, s, emitted = None, None, 0, 0.0, 0
        out = []
        for t, v in zip(us.tolist(), vals.tolist()):
            if start_us is None:
                start_us, last_us, n, s = t, t, 1, float(v)
            elif t - last_us > gap_us:
                emitted += 1
                out.append((user_id, emitted, start_us, last_us, n, round(s, 4)))
                start_us, last_us, n, s = t, t, 1, float(v)
            else:
                last_us, n, s = t, n + 1, s + float(v)
        state.update((start_us, last_us, n, s, emitted))
        if out:
            df = pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_no", "start_ts", "end_ts",
                    "n_events", "sum_value",
                ],
            )
            df["start_ts"] = pd.to_datetime(df["start_ts"], unit="us")
            df["end_ts"] = pd.to_datetime(df["end_ts"], unit="us")
            yield df

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        _SESSION_SCHEMA,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts_sql(window_hours: int = 1) -> str:
    """DuckDB oracle for the batch form of windowed_event_counts."""
    return f"""
SELECT time_bucket(INTERVAL '{window_hours} hour', ts) AS win_start,
       time_bucket(INTERVAL '{window_hours} hour', ts)
           + INTERVAL '{window_hours} hour' AS win_end,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


DEDUP_STREAM_SCHEMA = "content_hash string, doc_id bigint"


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact deduplication with KEEPER semantics: across
    micro-batches, emit one (content_hash, doc_id) row the first time
    a content hash (md5 of the raw text, exactly like
    ``exact_dup_groups`` — no normalization) appears — the keeper is
    the minimum
    doc_id among that hash's arrivals in its first batch — and drop
    every later duplicate silently. This is the streaming counterpart
    of ``datapipe.dedup.exact_dup_groups``'s keeper assignment; the
    built-in ``dropDuplicates``/``dropDuplicatesWithinWatermark``
    dedups rows but cannot express "min-id keeper per group, emitted
    exactly once", which needs one tiny state cell per hash.

    Scale note: state is one boolean per distinct hash and grows
    unboundedly by design (exact dedup has to remember everything);
    production pipelines bound it with a retention watermark
    (``dropDuplicatesWithinWatermark``'s trade) or periodic state
    compaction against the sealed corpus — both documented trades,
    not defaults, because silently forgetting a hash re-admits
    duplicates.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (content_hash,) = key
        if state.exists:
            # keeper already emitted in an earlier batch: drain and drop
            for _ in pdfs:
                pass
            return
        keeper = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                keeper = m if keeper is None else min(keeper, m)
        if keeper is None:
            return
        state.update((1,))
        yield pd.DataFrame(
            {"content_hash": [content_hash], "doc_id": [keeper]}
        )

    return (
        # null text never dedups (md5(NULL)=NULL would fuse all
        # null-text docs into one fake cluster — match the batch op's
        # filter), and only (hash, doc_id) crosses the stateful
        # shuffle: the text payload the state fn never reads stays out
        docs.filter(F.col("text").isNotNull())
        .select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .applyInPandasWithState(
            fn,
            DEDUP_STREAM_SCHEMA,
            "seen int",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
