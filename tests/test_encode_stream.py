"""Streaming encode: micro-batches land in the encoded store with the
same sha-identity + resume guarantees as the batch path."""

from pyspark.sql import functions as F

from howard_spark.checkpoint import encode_to_dir
from howard_spark.streaming.encode_stream import (
    decode_encoded_stream,
    encode_stream,
    stream_manifest_summary,
)

SF = "/root/testdata/sf0.001"


def _split_source(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)
    return docs, src


def test_stream_encode_sha_matches_source(spark, tmp_path):
    docs, src = _split_source(spark, tmp_path)
    out = str(tmp_path / "store")

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = encode_stream(stream, out, keys=["doc_id"],
                      checkpoint_dir=str(tmp_path / "ckpt"), npartitions=4)
    q.awaitTermination(180)

    summary = stream_manifest_summary(out)
    assert len(summary) == 2  # one store per micro-batch
    assert sum(b["rows"] for b in summary.values()) == docs.count()
    assert all(b["parts"] > 0 for b in summary.values())

    dec = decode_encoded_stream(spark, out, docs.schema)
    a = docs.select(F.sha2("text", 256).alias("h")).groupBy("h").count()
    b = dec.select(F.sha2("text", 256).alias("h")).groupBy("h").count()
    assert a.exceptAll(b).unionAll(b.exceptAll(a)).count() == 0


def test_stream_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id, same content) must be a
    file-level no-op: every partition already committed gets skipped."""
    docs, src = _split_source(spark, tmp_path)
    out = str(tmp_path / "store")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = encode_stream(stream, out, keys=["doc_id"],
                      checkpoint_dir=str(tmp_path / "ckpt"), npartitions=4)
    q.awaitTermination(180)

    # simulate Spark replaying batch 0: same rows into the same dir
    batch0 = docs.where(F.col("doc_id") % 2 == 0)
    m = encode_to_dir(batch0, f"{out}/batch-000000", keys=["doc_id"],
                      npartitions=4, resume=True)
    assert m["parts_skipped"] == m["parts_total"] > 0
    assert m["parts_encoded_this_run"] == 0


def test_compact_stream_store_equals_batch_encode(spark, tmp_path):
    """Compaction of the per-batch stores must reproduce what a ONE-SHOT
    batch encode of the same rows produces (decode-identical; and the
    canonical store is a single dir with its own manifests)."""
    import os

    from howard_spark.encode import decode_df
    from howard_spark.checkpoint import read_encoded
    from howard_spark.streaming.encode_stream import compact_stream_store

    docs, src = _split_source(spark, tmp_path)
    out = str(tmp_path / "store")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = encode_stream(stream, out, keys=["doc_id"],
                      checkpoint_dir=str(tmp_path / "ckpt"), npartitions=4)
    q.awaitTermination(180)

    dst = str(tmp_path / "canonical")
    m = compact_stream_store(spark, out, dst, keys=["doc_id"],
                             schema=docs.schema, npartitions=4)
    assert m["rows"] == docs.count()
    assert os.path.isdir(f"{dst}/_manifest")

    dec = decode_df(read_encoded(spark, dst), docs.schema)
    a = docs.select(F.sha2("text", 256).alias("h")).groupBy("h").count()
    b = dec.select(F.sha2("text", 256).alias("h")).groupBy("h").count()
    assert a.exceptAll(b).unionAll(b.exceptAll(a)).count() == 0


def test_empty_batch_does_not_brick_store(spark, tmp_path):
    """ADVICE r4: an empty micro-batch must neither create an
    unreadable zero-parquet batch dir (sink guard) nor — if one exists
    anyway, e.g. from an older store — break the union read (reader
    guard skips parquet-less data/ dirs)."""
    import os

    docs, src = _split_source(spark, tmp_path)
    out = str(tmp_path / "store")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = encode_stream(stream, out, keys=["doc_id"],
                      checkpoint_dir=str(tmp_path / "ckpt"), npartitions=2)
    q.awaitTermination(180)

    # simulate a legacy store poisoned by an empty batch dir
    os.makedirs(os.path.join(out, "batch-000099", "data"))
    dec = decode_encoded_stream(spark, out, docs.schema)
    assert dec.count() == docs.count()

    # sink guard: an empty micro-batch creates no batch dir at all
    # (exercise the real foreachBatch sink over an all-filtered source)
    before = set(os.listdir(out))
    empty_src = str(tmp_path / "empty_src")
    docs.where(F.lit(False)).coalesce(1).write.parquet(empty_src)
    stream2 = (spark.readStream.schema(docs.schema)
               .option("maxFilesPerTrigger", "1").parquet(empty_src))
    q2 = encode_stream(stream2, out, keys=["doc_id"],
                       checkpoint_dir=str(tmp_path / "ckpt2"), npartitions=2)
    q2.awaitTermination(180)
    after = set(os.listdir(out))
    assert after == before  # no new batch dirs from the empty batch
