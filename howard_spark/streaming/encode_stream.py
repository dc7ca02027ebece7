"""Continuous ingest into the encoded columnar store.

``encode_stream`` runs the SAME deterministic checkpoint-encode kernel
(checkpoint.py: driver-planned range partitions, per-partition
tmp+rename commits, manifest lineage) on every micro-batch via
``foreachBatch``, writing each batch into its own
``out_dir/batch-<id>/`` store.

Exactly-once story, two layers deep:

- Spark's streaming checkpoint replays a failed micro-batch with the
  SAME batch_id; the batch re-enters ``encode_to_dir(resume=True)`` on
  the same directory, where committed partitions are skipped and
  re-encoded ones are byte-identical (encode output is a pure function
  of batch content — checkpoint.py's determinism contract). Replay is
  therefore idempotent at the file level, not just the row level.
- Within a batch, a mid-job executor failure leaves committed parts +
  manifests behind; the batch retry completes only the remainder.

The reference has no streaming surface at all (DuckDB batch loads,
/root/reference/howard/objects/variants.py load_data); this is the
Spark-native capability the 100-TB ingest pipeline needs — encode keeps
up with arrival instead of re-scanning the corpus.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame

from ..checkpoint import encode_to_dir
from ..encode import DEFAULT_CHUNK_ROWS


def encode_stream(
    stream_df: DataFrame,
    out_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    npartitions: int | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    trigger_available_now: bool = True,
):
    """Start the encode stream; returns the StreamingQuery.

    ``checkpoint_dir`` is Spark's streaming offset log (batch replay);
    ``out_dir`` accumulates one encoded store per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # An empty micro-batch must not create a batch-N/data/ dir
            # with zero parquet files — spark.read.parquet over such a
            # dir fails schema inference and bricks the whole store.
            return
        bdir = os.path.join(out_dir, f"batch-{batch_id:06d}")
        encode_to_dir(batch_df, bdir, keys=keys,
                      npartitions=npartitions, chunk_rows=chunk_rows,
                      resume=True)

    w = (stream_df.writeStream.foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_encoded_stream(spark, out_dir: str) -> DataFrame:
    """All encoded chunk rows across every committed micro-batch, with
    a ``__batch`` discriminator column — (part_id, chunk_id) repeat
    across batch stores, so decode must group on all three (pass
    ``group_extra=['__batch']`` to ``decode_df``, or use
    :func:`decode_encoded_stream`)."""
    from pyspark.sql import functions as F

    dirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, "batch-*", "data"))
        # Defense in depth vs the empty-batch guard in encode_stream:
        # a data/ dir with no parquet files would fail schema inference
        # for the WHOLE union read, so skip it rather than brick the store.
        if glob.glob(os.path.join(d, "*.parquet"))
    )
    if not dirs:
        raise FileNotFoundError(f"no encoded batches under {out_dir}")
    return spark.read.parquet(*dirs).withColumn(
        "__batch",
        F.regexp_extract(F.input_file_name(), r"(batch-\d+)", 1))


def decode_encoded_stream(spark, out_dir: str, schema,
                          columns: list[str] | None = None) -> DataFrame:
    """Decode the whole streaming store back to the source relation."""
    from ..encode import decode_df

    return decode_df(read_encoded_stream(spark, out_dir), schema,
                     columns=columns, group_extra=["__batch"])


def stream_manifest_summary(out_dir: str) -> dict:
    """Lineage rollup across batches: rows / bytes / parts per batch
    (the observability surface a long-running ingest job monitors)."""
    import json

    out = {}
    for bdir in sorted(glob.glob(os.path.join(out_dir, "batch-*"))):
        batch = os.path.basename(bdir)
        rows = raw = enc = parts = 0
        for mf in glob.glob(os.path.join(bdir, "_manifest", "part-*.json")):
            with open(mf) as fh:
                m = json.load(fh)
            parts += 1
            rows += m["n_rows"]
            raw += m["raw_bytes"]
            enc += m["enc_bytes"]
        out[batch] = {"parts": parts, "rows": rows,
                      "raw_bytes": raw, "enc_bytes": enc}
    return out


def compact_stream_store(
    spark,
    out_dir: str,
    dst_dir: str,
    keys: list[str],
    schema,
    npartitions: int | None = None,
):
    """Compact a streaming store (many small per-batch stores) into ONE
    canonical checkpointed store.

    Long-running ingest accumulates a store per micro-batch — hundreds
    of small files whose range partitioning reflects arrival order, not
    the global key space. Compaction decodes the union and re-encodes
    through the batch writer: the result is the SAME bytes a one-shot
    batch encode of the full data would produce (checkpoint.py's
    determinism contract), so downstream consumers can switch dirs
    atomically. Run it from a maintenance job; the stream keeps
    appending new batch dirs meanwhile and the next compaction folds
    them in. Returns encode_to_dir's metrics."""
    from ..checkpoint import encode_to_dir

    dec = decode_encoded_stream(spark, out_dir, schema)
    return encode_to_dir(dec, dst_dir, keys=keys, npartitions=npartitions)
