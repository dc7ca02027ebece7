"""Spark encode/decode pipeline tests (north-rule invariants).

- round-trip sha256 bit-identity on the synthetic corpus AND on every
  driver-provided table (FIXTURES.md F3);
- size bound: encoded bytes <= Spark-default Parquet bytes of same df;
- checkpoint resume: kill after k parts -> re-run encodes only the
  rest and output is byte-identical to an uninterrupted run (F4).
"""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from howard_spark.checkpoint import encode_to_dir, read_encoded
from howard_spark.corpus import corpus_df
from howard_spark.encode import decode_df, encode_df, encoded_summary, verify_roundtrip

N_ROWS = 8000


@pytest.fixture(scope="module")
def corpus(spark):
    df = corpus_df(spark, N_ROWS, npartitions=8).cache()
    df.count()
    yield df
    df.unpersist()


def test_corpus_deterministic(spark):
    a = corpus_df(spark, 500, npartitions=2).orderBy("repo", "path").collect()
    b = corpus_df(spark, 500, npartitions=5).orderBy("repo", "path").collect()
    assert a == b  # partitioning must not change the logical table


def test_corpus_shape(corpus):
    assert corpus.count() == N_ROWS
    langs = corpus.select("lang").distinct().count()
    assert langs <= 16
    # mega-repo skew: top repo holds >= 25% of rows
    top = corpus.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert top["count"] >= N_ROWS * 0.25


def test_roundtrip_corpus_sha_identity(spark, corpus):
    enc = encode_df(corpus, chunk_rows=2048, partition_by=["repo", "path"]).cache()
    dec = decode_df(enc, corpus.schema)
    assert verify_roundtrip(corpus, dec, [f.name for f in corpus.schema.fields]) == 0
    # per-row content sha equality, joined on the (repo,path,commit) key
    j = (
        corpus.select("repo", "path", "commit", F.sha2("content", 256).alias("src_sha"))
        .join(
            dec.select("repo", "path", "commit", F.sha2("content", 256).alias("dec_sha")),
            ["repo", "path", "commit"],
        )
        .where(F.col("src_sha") != F.col("dec_sha"))
    )
    assert j.count() == 0
    enc.unpersist()


def test_size_bound_vs_parquet(spark, corpus, tmp_path):
    pq_dir = str(tmp_path / "ref.parquet")
    corpus.write.parquet(pq_dir)  # Spark default codec = the reference size
    pq_bytes = sum(
        os.path.getsize(f) for f in glob.glob(pq_dir + "/*.parquet")
    )
    enc = encode_df(corpus, chunk_rows=2048, partition_by=["repo", "path"])
    enc_bytes = enc.agg(F.sum("enc_bytes")).first()[0]
    assert enc_bytes <= pq_bytes, f"encoded {enc_bytes} > parquet {pq_bytes}"


def test_roundtrip_driver_tables(spark, sf_dir):
    for f in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        df = spark.read.parquet(f).cache()
        enc = encode_df(df, chunk_rows=4096)
        dec = decode_df(enc, df.schema)
        cols = [c for c in df.columns]
        assert verify_roundtrip(df, dec, cols) == 0, f
        df.unpersist()


def test_column_pruned_decode(spark, corpus):
    enc = encode_df(corpus, chunk_rows=2048)
    dec = decode_df(enc, corpus.schema, columns=["repo", "lang"])
    assert dec.columns == ["repo", "lang"]
    assert dec.count() == N_ROWS
    got = {r["lang"] for r in dec.select("lang").distinct().collect()}
    want = {r["lang"] for r in corpus.select("lang").distinct().collect()}
    assert got == want


def test_encoded_summary_metrics(spark, corpus):
    enc = encode_df(corpus, chunk_rows=2048, partition_by=["repo", "path"])
    rows = encoded_summary(enc).collect()  # a column may mix codecs across chunks
    by_col: dict[str, set] = {}
    for r in rows:
        by_col.setdefault(r["column"], set()).add(r["codec"])
    assert by_col["lang"] <= {"sdict", "sconst"}  # low-card -> dict family
    assert by_col["mtime_epoch"] <= {"for", "rle", "dicti", "const"}  # FoR family
    total_rows = corpus.count() * len(corpus.columns)
    assert sum(r["rows"] for r in rows) == total_rows


# -- checkpoint / resume (FIXTURES.md F4) -----------------------------------

def _dir_signature(d: str) -> dict[str, bytes]:
    out = {}
    for f in sorted(glob.glob(os.path.join(d, "data", "*.parquet"))):
        with open(f, "rb") as fh:
            out[os.path.basename(f)] = fh.read()
    return out


def test_checkpoint_resume_byte_identical(spark, corpus, tmp_path):
    clean, broken = str(tmp_path / "clean"), str(tmp_path / "broken")

    m1 = encode_to_dir(corpus, clean, keys=["repo", "path"], npartitions=6,
                       chunk_rows=2048)
    assert m1["parts_total"] == 6
    assert m1["rows"] == N_ROWS

    # run 2: inject a failure on one partition -> job dies mid-way
    with pytest.raises(Exception):
        encode_to_dir(corpus, broken, keys=["repo", "path"], npartitions=6,
                      chunk_rows=2048, fail_on_parts={3})
    done_after_crash = len(glob.glob(os.path.join(broken, "_manifest", "*.json")))
    assert done_after_crash < 6

    # resume: only remaining parts encoded; bytes identical to clean run.
    # (straggler tasks may commit between the abort and this scan, so the
    # skip count is >= what we measured right after the crash and < 6 —
    # the injected part 3 can never have committed)
    m3 = encode_to_dir(corpus, broken, keys=["repo", "path"], npartitions=6,
                       chunk_rows=2048)
    assert m3["parts_total"] == 6
    assert done_after_crash <= m3["parts_skipped"] < 6
    assert m3["parts_encoded_this_run"] >= 1
    assert _dir_signature(broken) == _dir_signature(clean)

    # the checkpointed encoding decodes back bit-identically
    enc = read_encoded(spark, broken)
    dec = decode_df(enc, corpus.schema)
    assert verify_roundtrip(corpus, dec, [f.name for f in corpus.schema.fields]) == 0


def test_bucketed_decode_no_shuffle(spark, corpus, tmp_path):
    """At-scale read path: decode from a bucketed encoded table must
    contain zero Exchange operators (payloads never shuffle)."""
    import contextlib
    import io
    import re

    from howard_spark.encode import decode_table, save_encoded_table

    try:
        enc = encode_df(corpus, chunk_rows=1024, partition_by=["repo", "path"])
        save_encoded_table(enc, "enc_corpus_test", buckets=8)
        dec = decode_table(spark, "enc_corpus_test", corpus.schema, columns=["repo", "lang"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            dec.explain("formatted")
        assert len(re.findall(r"\(\d+\) Exchange", buf.getvalue())) == 0
        assert dec.count() == N_ROWS
    finally:
        spark.sql("DROP TABLE IF EXISTS enc_corpus_test")


def test_resume_noop_when_complete(spark, corpus, tmp_path):
    d = str(tmp_path / "full")
    encode_to_dir(corpus, d, keys=["repo", "path"], npartitions=4, chunk_rows=2048)
    sig = _dir_signature(d)
    m = encode_to_dir(corpus, d, keys=["repo", "path"], npartitions=4, chunk_rows=2048)
    assert m["parts_skipped"] == 4
    assert m["parts_encoded_this_run"] == 0
    assert _dir_signature(d) == sig


def test_verify_store_scrub_detects_corruption(spark, tmp_path):
    """verify_store: clean store passes; a flipped payload byte is a
    payload mismatch; a dropped chunk row is a manifest mismatch."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from howard_spark.checkpoint import encode_to_dir, verify_store

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "store")
    encode_to_dir(docs, out, keys=["doc_id"], npartitions=4)

    v = verify_store(spark, out)
    assert v["ok"] and v["payload_mismatches"] == 0
    assert v["parts"] == 4 and v["chunks"] > 0

    files = sorted(glob.glob(f"{out}/data/part-*.parquet"))

    # 1. bit rot: flip one byte inside one payload, keep everything else
    t = pq.read_table(files[0])
    payloads = t.column("payload").to_pylist()
    payloads[0] = bytes([payloads[0][0] ^ 0xFF]) + payloads[0][1:]
    t = t.set_column(t.schema.get_field_index("payload"),
                     "payload", pa.array(payloads, type=pa.binary()))
    pq.write_table(t, files[0], compression="none")
    v = verify_store(spark, out)
    assert not v["ok"] and v["payload_mismatches"] == 1
    assert v["manifest_mismatches"] == []  # sha column untouched

    # 2. lost chunk row: drop the first row of another part's file
    t2 = pq.read_table(files[1])
    pq.write_table(t2.slice(1), files[1], compression="none")
    v = verify_store(spark, out)
    assert v["manifest_mismatches"] != []
