"""Chunk-level data skipping (min/max stats) tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from howard_spark.corpus import corpus_df
from howard_spark.encode import decode_df, encode_df, prune_chunks


@pytest.fixture(scope="module")
def enc_corpus(spark):
    c = corpus_df(spark, 6000, npartitions=8).cache()
    c.count()
    enc = encode_df(c, chunk_rows=512, partition_by=["repo", "path"]).cache()
    enc.count()
    yield c, enc
    enc.unpersist()
    c.unpersist()


def test_stats_present(enc_corpus):
    _, enc = enc_corpus
    r = enc.where("column = 'mtime_epoch'").select("vmin", "vmax").first()
    assert r["vmin"] is not None and int(r["vmax"]) >= int(r["vmin"])
    s = enc.where("column = 'repo'").select("vmin", "vmax").first()
    assert s["vmin"].startswith("org")


def test_prune_reduces_chunks_and_stays_correct(spark, enc_corpus):
    c, enc = enc_corpus
    target = c.select("repo").distinct().orderBy("repo").collect()[-1]["repo"]
    pruned = prune_chunks(enc, "repo", lo=target, hi=target)
    total = enc.select("part_id", "chunk_id").distinct().count()
    kept = pruned.select("part_id", "chunk_id").distinct().count()
    assert kept < total  # range partitioning makes repo ranges skippable
    # superset-decode + exact filter == direct filter of the source
    dec = decode_df(pruned, c.schema, columns=["repo", "path"]).where(
        F.col("repo") == target
    )
    assert dec.count() == c.where(F.col("repo") == target).count()


def test_prune_numeric_range(spark, enc_corpus):
    c, enc = enc_corpus
    lo, hi = 1_700_010_000, 1_700_020_000
    pruned = prune_chunks(enc, "mtime_epoch", lo=lo, hi=hi, dtype="long")
    dec = decode_df(pruned, c.schema, columns=["mtime_epoch"]).where(
        F.col("mtime_epoch").between(lo, hi)
    )
    want = c.where(F.col("mtime_epoch").between(lo, hi)).count()
    assert dec.count() == want


def test_prune_no_match_empty(spark, enc_corpus):
    c, enc = enc_corpus
    pruned = prune_chunks(enc, "repo", lo="zzz", hi="zzzz")
    assert pruned.count() == 0


def test_prune_on_statless_column_keeps_everything(spark):
    """Columns that never get min/max stats (binary, list, all-null)
    must SURVIVE pruning — NULL vmin/vmax means 'unknown', not 'empty'
    (round-1 advice: the superset promise silently broke)."""
    rows = [(i, bytes([i % 7]) * 3, [float(i), float(i + 1)], None)
            for i in range(2000)]
    df = spark.createDataFrame(
        rows, "id long, payload binary, vec array<double>, always_null string")
    enc = encode_df(df, chunk_rows=256).cache()
    enc.count()

    for col in ("payload", "vec", "always_null"):
        kept = prune_chunks(enc, col, lo=0, hi=10)
        dec = decode_df(kept, df.schema)
        assert dec.count() == 2000, f"pruning on stat-less {col} dropped rows"

    # and a normal stats column still actually prunes
    kept = prune_chunks(enc, "id", lo=0, hi=100, dtype="long")
    assert kept.select("part_id", "chunk_id").distinct().count() < \
        enc.select("part_id", "chunk_id").distinct().count()
    enc.unpersist()
