"""Streaming stateful LSH near-dup: band keys bit-match the batch
minhash pipeline, and the stream's candidate pairs equal the batch
q32 pairs on the same documents — including pairs whose two docs
arrive in DIFFERENT micro-batches (state crosses batches)."""

from pyspark.sql import functions as F

from howard_spark.operators.dedup import q31, band_pairs
from howard_spark.streaming.neardup import (
    band_keys_df,
    neardup_pairs_stream,
)

SF = "/root/testdata/sf0.001"


def test_band_keys_bit_match_batch_pipeline(spark):
    """The pandas kernel must reproduce the JVM md5 minhash banding
    byte-for-byte (same shingles, same seed prefix, same band md5)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    stream_keys = {(r["doc_id"], r["band"]): r["band_key"]
                   for r in band_keys_df(docs).collect()}
    # derive batch band keys exactly as band_pairs does
    from howard_spark.operators.dedup import BAND_ROWS
    sigs = q31(spark, SF)
    batch = (
        sigs.join(docs.select("doc_id"), "doc_id")
        .withColumn("band", (F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.lpad("seed", 2, "0"),
                        F.col("mh").cast("string")))))).alias("band_key"))
    )
    batch_keys = {(r["doc_id"], r["band"]): r["band_key"]
                  for r in batch.collect()}
    assert stream_keys == batch_keys


def test_stream_pairs_equal_batch_across_microbatches(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    batch_pairs = {(r["doc_a"], r["doc_b"])
                   for r in band_pairs(q31(spark, SF)).collect()}

    # split the table into two micro-batch files by doc_id parity so
    # near-dup partners land in different batches
    src = str(tmp_path / "src")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (neardup_pairs_stream(stream)
         .writeStream.format("memory").queryName("nd_pairs")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["doc_a"], r["doc_b"])
           for r in spark.sql("SELECT doc_a, doc_b FROM nd_pairs").collect()}
    assert got == batch_pairs
    assert len(got) > 0  # the fixture genuinely has near-dups


def test_same_batch_pairs_emitted_exactly_once(spark, tmp_path):
    """Multiset check: docs colliding within ONE micro-batch must emit
    each (pair, band) row once — the old `seen + new_ids[:j]` iteration
    double-counted same-batch predecessors (set-compare tests hid it)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)  # one batch

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (neardup_pairs_stream(stream)
         .writeStream.format("memory").queryName("nd_once")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT doc_a, doc_b, band, band_key FROM nd_once").collect()
    keys = [(r["doc_a"], r["doc_b"], r["band"], r["band_key"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert len(keys) > 0


def test_null_text_docs_emit_no_bands(spark):
    """NULL-text docs must vanish from the kernel (batch explode drops
    them); bucketing them together as '' made them all candidates."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "some real text body here")],
        "doc_id long, text string")
    got = band_keys_df(docs).collect()
    assert {r["doc_id"] for r in got} == {3}


def test_batch_fallback_matches_q32(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {(r["doc_a"], r["doc_b"])
           for r in neardup_pairs_stream(docs).select(
               "doc_a", "doc_b").distinct().collect()}
    want = {(r["doc_a"], r["doc_b"])
            for r in band_pairs(q31(spark, SF)).collect()}
    assert got == want
