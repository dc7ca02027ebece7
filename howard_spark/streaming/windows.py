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


def dedup_stream(
    docs: DataFrame,
    hash_col: str = "h",
    n_buckets: int = 32,
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming EXACT DEDUP as a custom stateful operator
    (``applyInPandasWithState``): emit each document hash the first
    time it is seen across the whole stream; drop repeats — the
    continuous-ingest form of q30.

    State design (the 100 TB story): groups are hash-prefix buckets
    (pmod(xxhash64(h), n_buckets)), so state shards evenly across
    executors regardless of content skew; each group's state is the
    set of hashes it has admitted. Works identically on a batch
    DataFrame via the groupBy fallback (tests assert batch ≡ stream).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    bucketed = docs.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(hash_col)), F.lit(n_buckets)).cast("int")
    )
    out_schema = docs.schema
    state_schema = "seen array<string>"

    def dedup_fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            first_idx = []
            for i, h in enumerate(pdf[hash_col]):
                if h not in seen:
                    seen.add(h)
                    first_idx.append(i)
            if first_idx:
                yield pdf.iloc[first_idx].drop(columns=["__bucket"])
        state.update((list(seen),))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)

    if docs.isStreaming:
        timeout = (GroupStateTimeout.ProcessingTimeTimeout
                   if state_timeout_ms else GroupStateTimeout.NoTimeout)
        return bucketed.groupBy("__bucket").applyInPandasWithState(
            dedup_fn, out_schema, state_schema, "append", timeout
        )
    # batch fallback: same semantics, one pass
    from pyspark.sql.window import Window

    w = Window.partitionBy(hash_col).orderBy(F.monotonically_increasing_id())
    return (
        bucketed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__bucket")
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
