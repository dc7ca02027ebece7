"""Sources (format round-trips incl. VCF) + streaming + multimodal stubs."""

from __future__ import annotations

import gzip
import os

import pytest

from pyspark.sql import functions as F

from howard_spark.operators.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    synthesize_media,
)
from howard_spark.sources import read_table, read_vcf, write_table
from howard_spark.sources.readers import parse_vcf_info_fields
from howard_spark.streaming import sessionize, windowed_event_counts

VCF_TEXT = """##fileformat=VCFv4.2
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##INFO=<ID=AF,Number=A,Type=Float,Description="Allele freq">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
chr1\t768253\trs1\tA\tG\t99.5\tPASS\tDP=125;AF=0.5
chr1\t768300\t.\tAT\tA\t.\tPASS\tDP=50
chr7\t55249063\t.\tG\tGA\t12\tq10\tDP=9
"""


@pytest.fixture(scope="module")
def vcf_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("vcf") / "example.vcf"
    p.write_text(VCF_TEXT)
    gz = str(p) + ".gz"
    with gzip.open(gz, "wt") as fh:
        fh.write(VCF_TEXT)
    return str(p), gz


def test_read_vcf_plain_and_gz(spark, vcf_path):
    plain, gz = vcf_path
    for path in (plain, gz):
        df = read_vcf(spark, path)
        assert df.columns == ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]
        assert df.count() == 3
        r = df.where("POS = 768253").first()
        assert r["QUAL"] == 99.5 and r["INFO"] == "DP=125;AF=0.5"
        assert df.where("POS = 768300").first()["QUAL"] is None
        assert dict(df.dtypes)["POS"] == "int"


def test_vcf_header_schema_authority(vcf_path):
    infos = parse_vcf_info_fields(vcf_path[0])
    assert {f["ID"]: f["Type"] for f in infos} == {"DP": "Integer", "AF": "Float"}


def test_delimited_roundtrips(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.concat(F.lit("v"), "id").alias("s")
    )
    for fmt in ("csv", "tsv", "psv", "json", "parquet"):
        out = str(tmp_path / f"t.{fmt}")
        write_table(df, out, fmt=fmt, schema_sidecar=(fmt != "parquet"))
        back = read_table(spark, out, fmt=fmt)
        assert back.count() == 100
        assert sorted(back.columns) == sorted(df.columns)


def test_bed_reader(spark, tmp_path):
    p = tmp_path / "regions.bed"
    p.write_text("chr1\t100\t200\tgeneA\nchr2\t5\t50\tgeneB\n")
    df = read_table(spark, str(p), fmt="bed", header=False)
    assert df.columns[:3] == ["#CHROM", "START", "END"]
    assert df.count() == 2


def test_write_order_by_validation(spark, tmp_path):
    df = spark.range(10)
    with pytest.raises(ValueError):
        write_table(df, str(tmp_path / "x.parquet"), order_by=["nope"])


# -- streaming ---------------------------------------------------------------

def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    batch = windowed_event_counts(events).orderBy("bucket", "event_type")

    # FileStreamSource requires a directory
    import shutil
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "events.parquet")
    stream = spark.readStream.schema(events.schema).parquet(str(stream_dir))
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").orderBy("bucket", "event_type")
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in batch.collect()]


def test_sessionize_batch(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = sessionize(events, gap="30 minutes")
    assert s.count() > 0
    agg = s.agg(F.sum("events")).first()[0]
    assert agg == events.count()  # every event lands in exactly one session


# -- multimodal stubs ---------------------------------------------------------

def test_decode_image_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a.shape == (8, 8, 3) and (a == b).all()  # deterministic


def test_media_feature_pipeline(spark):
    media = synthesize_media(spark, 60)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(len(r["feature"]) == 16 for r in rows)
    # determinism across runs
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=16).collect()}
    assert all(again[r["media_id"]] == list(r["feature"]) for r in rows)


def test_resize_images(spark):
    from howard_spark.operators.multimodal import resize_images

    media = synthesize_media(spark, 20)
    out = resize_images(media, height=4, width=4).collect()
    assert len(out) == 20
    assert all(r["height"] == 4 and r["width"] == 4 for r in out)
    assert all(len(r["pixels"]) == 4 * 4 * 3 for r in out)  # HxWx3 uint8
    # determinism
    again = {r["media_id"]: bytes(r["pixels"])
             for r in resize_images(media, height=4, width=4).collect()}
    assert all(again[r["media_id"]] == bytes(r["pixels"]) for r in out)


def test_frame_sampling_plan(spark):
    media = synthesize_media(spark, 30)
    frames = frame_sample(media, every_ms=1000)
    vids = media.where("kind = 'video'").select("media_id", "duration_ms").collect()
    expect = sum(v["duration_ms"] // 1000 + 1 for v in vids)
    assert frames.count() == expect


def test_encode_stream_roundtrip(spark, sf_dir, tmp_path):
    """Continuous ingest: stream -> codec engine -> encoded store ->
    decode equals the batch input (sha multiset)."""
    import shutil

    from pyspark.sql import functions as F

    from howard_spark.streaming import decode_encoded_stream, encode_stream

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src_dir / "events.parquet")

    stream = spark.readStream.schema(events.schema).parquet(str(src_dir))
    out = str(tmp_path / "enc_stream")
    q = encode_stream(stream, out, keys=["user_id", "event_id"],
                      checkpoint_dir=str(tmp_path / "ckpt"), npartitions=4)
    q.awaitTermination(180)

    dec = decode_encoded_stream(spark, out, events.schema)
    assert dec.count() == events.count()
    sig = lambda d: d.select(
        F.sha2(F.concat_ws("|", *[F.col(c).cast("string") for c in events.columns]), 256).alias("h")
    ).groupBy("h").count()
    assert sig(events).exceptAll(sig(dec)).isEmpty()


def test_decode_image_capability_probe(monkeypatch):
    """When an Image backend appears (Pillow probe), fake=False decodes
    through it instead of raising — zero-code-change upgrade path."""
    import io

    import numpy as np

    from howard_spark.operators import multimodal as mm

    class FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return np.zeros((2, 3, 3), dtype=np.uint8)

    class FakeBackend:
        @staticmethod
        def open(buf):
            assert isinstance(buf, io.BytesIO)
            return FakeImg()

    monkeypatch.setattr(mm, "PIL_IMAGE", FakeBackend)
    out = mm.decode_image(b"anything")
    assert out.shape == (2, 3, 3) and out.dtype == np.uint8
