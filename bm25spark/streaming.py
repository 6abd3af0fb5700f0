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

from .index import Bm25Index


def stream_ingest(
    stream_df: DataFrame,
    index_dir: str,
    text_col: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
):
    """Append a streaming document source into the index's delta
    segment. Returns the StreamingQuery."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        idx = Bm25Index(spark, index_dir)
        keep = list(dict.fromkeys([*idx.payload_cols, text_col]))
        import os

        batch_df.select(*keep).write.mode("append").parquet(
            os.path.join(index_dir, "delta")
        )

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
