"""Custom stateful streaming operator: exact dedup via
applyInPandasWithState (streaming form of q30). Asserts stream output
== batch dedup on the same input, including dedup ACROSS micro-batches
(state survives batches)."""

from pyspark.sql import functions as F

from howard_spark.streaming.windows import dedup_stream


def _write_batches(spark, src_dir):
    # batch 0: docs 0..9 (h0..h4 repeated) ; batch 1: overlaps batch 0
    b0 = [(i, f"h{i % 5}", f"text{i}") for i in range(10)]
    b1 = [(i + 10, f"h{(i % 7)}", f"text{i+10}") for i in range(10)]
    schema = "doc_id long, h string, text string"
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{src_dir}/b0")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(
        f"{src_dir}/b0")  # same dir: one availableNow pass reads both
    return spark.read.parquet(f"{src_dir}/b0")


def test_dedup_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    all_docs = _write_batches(spark, src)

    batch_out = dedup_stream(all_docs)
    batch_hashes = {r["h"] for r in batch_out.collect()}
    assert batch_out.count() == batch_out.select("h").distinct().count()

    stream = spark.readStream.schema(all_docs.schema).parquet(f"{src}/b0")
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_out")
    # exactly one row per distinct hash, same hash set as batch
    assert got.count() == got.select("h").distinct().count()
    assert {r["h"] for r in got.collect()} == batch_hashes


def test_dedup_batch_keeps_first(spark):
    rows = [(1, "a", "t1"), (2, "a", "t2"), (3, "b", "t3")]
    df = spark.createDataFrame(rows, "doc_id long, h string, text string")
    out = {r["h"]: r["doc_id"] for r in dedup_stream(df).collect()}
    assert set(out) == {"a", "b"}
