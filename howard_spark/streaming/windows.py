"""Streaming windowed aggregation + sessionization.

The reference is strictly batch (SURVEY.md §1: "no streams"); this
module adds the Structured Streaming surface a continuous ingest
pipeline needs: watermarked tumbling-window rollups (late data
handled by the watermark) and session windows. The batch-equivalent
of ``windowed_event_counts`` is operators/relational.py q20 — tests
assert batch/stream agreement on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Works on both a streaming and a batch DataFrame (the plan is
    identical; the watermark is a no-op in batch mode).
    """
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the cast
    # is instant-preserving
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = src.withWatermark(ts_col, watermark) if src.isStreaming else src
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count("*").alias("events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "events",
            "total_value",
        )
    )


def encode_stream(
    stream: DataFrame,
    out_dir: str,
    keys: list[str],
    npartitions: int = 8,
    chunk_rows: int = 65536,
):
    """Continuous ingest through the codec engine: each micro-batch is
    encoded to ``out_dir/batch=<id>/`` with the checkpointed writer
    (atomic per-partition commit + manifest). Streaming exactly-once
    composes from Structured Streaming's batch-id replay + the writer's
    resume: a replayed batch skips its already-committed partitions.

    Returns the StreamingQuery. Read everything back with
    ``spark.read.parquet(f"{out_dir}/batch=*/data")``.
    """
    from ..checkpoint import encode_to_dir

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_to_dir(
            batch_df, f"{out_dir}/batch={batch_id}", keys=keys,
            npartitions=npartitions, chunk_rows=chunk_rows, resume=True,
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{out_dir}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows per user: events separated by < gap are one
    session. Uses the built-in session_window — stateful streaming
    operator, also valid in batch."""
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = src.withWatermark(ts_col, gap) if src.isStreaming else src
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), key)
        .agg(F.count("*").alias("events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key,
            "events",
            "total_value",
        )
    )
