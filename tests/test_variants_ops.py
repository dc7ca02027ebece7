"""HOWARD-domain parity tests on synthetic variants fixtures
(FIXTURES.md F2) — golden-value style like the reference's
tests/test_variants_annotations_parquet.py:75-103."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from howard_spark.functions.info import explode_info, info_drop, info_get, info_set, pack_info
from howard_spark.operators.variants import (
    Criterion,
    annotate_equi,
    annotate_regions,
    best_transcript,
    classify_variant,
    prioritize,
)


@pytest.fixture(scope="module")
def variants(spark):
    rows = [
        ("chr1", 768253, "A", "G", "DP=125;AF=0.5"),
        ("chr1", 768300, "AT", "A", "DP=50"),
        ("chr7", 55249063, "G", "GA", ""),
        ("chr7", 55249171, "CG", "TA", "DP=9;AF=0.01"),
        ("chrX", 1000, "N", "<DEL>", "SVTYPE=DEL"),
    ]
    return spark.createDataFrame(rows, "`#CHROM` string, POS int, REF string, ALT string, INFO string")


def test_info_get_set_drop(spark, variants):
    df = variants.select(
        info_get("INFO", "DP").alias("dp"),
        info_drop("INFO", "DP").alias("no_dp"),
        info_set("INFO", "new", F.lit("x")).alias("with_new"),
    )
    rows = df.collect()
    assert rows[0]["dp"] == "125"
    assert rows[0]["no_dp"] == "AF=0.5"
    assert rows[0]["with_new"] == "DP=125;AF=0.5;new=x"
    assert rows[2]["dp"] == ""
    assert rows[2]["with_new"] == "new=x"


def test_explode_pack_roundtrip(spark, variants):
    ex = explode_info(variants, "INFO", ["DP", "AF", "SVTYPE"])
    assert ex.where("`INFO/DP` = '125'").count() == 1
    packed = pack_info(ex, ["DP", "AF", "SVTYPE"], out_col="INFO2")
    row = packed.where("POS = 768253").first()
    assert row["INFO2"] == "DP=125;AF=0.5"


def test_annotate_equi_golden(spark, variants):
    ann = spark.createDataFrame(
        [("chr1", 768253, "A", "G", 0.321), ("chr7", 55249063, "G", "GA", 0.9)],
        "`#CHROM` string, POS int, REF string, ALT string, nci60 double",
    )
    out = annotate_equi(variants, ann, broadcast_ann=True)
    # the reference's golden probe: INFO LIKE '%nci60=0.321%'
    assert out.where("`#CHROM`='chr1' AND POS=768253 AND INFO LIKE '%nci60=0.321%'").count() == 1
    assert out.where("POS=55249063 AND INFO = 'nci60=0.9'").count() == 1
    # unannotated rows keep their INFO untouched
    assert out.where("POS=768300 AND INFO='DP=50'").count() == 1
    assert out.count() == variants.count()


def test_annotate_regions_interval(spark, variants):
    bed = spark.createDataFrame(
        [("chr1", 768200, 768299, "geneA"), ("chr1", 768250, 768400, "geneB"),
         ("chr7", 1, 100, "far")],
        "`#CHROM` string, START int, END int, gene string",
    )
    out = annotate_regions(variants, bed, fields=["gene"])
    r = out.where("POS = 768253").first()
    assert info_get(F.lit(r["INFO"]), "gene") is not None
    assert "gene=geneA,geneB" in r["INFO"]
    r2 = out.where("POS = 768300").first()
    assert "geneB" in r2["INFO"] and "geneA" not in r2["INFO"]
    assert out.count() == variants.count()


def test_prioritize_fold(spark, variants):
    ex = explode_info(variants, "INFO", ["DP", "AF"])
    crits = [
        Criterion(field="INFO/DP", op="gte", value=100, score=10, comment="deep"),
        Criterion(field="INFO/DP", op="lt", value=10, score=-5, flag="FILTERED", comment="shallow"),
        Criterion(field="INFO/AF", op="gt", value=0.4, score=3),
    ]
    out = prioritize(ex, crits)
    r = {x["POS"]: x for x in out.collect()}
    assert r[768253]["PZScore"] == 13 and r[768253]["PZFlag"] == "PASS"
    assert r[55249171]["PZScore"] == -5 and r[55249171]["PZFlag"] == "FILTERED"
    assert r[55249171]["PZComment"] == "shallow"
    assert r[768300]["PZScore"] == 0


def test_classify_variant(spark, variants):
    out = variants.select("POS", classify_variant().alias("cls"))
    r = {x["POS"]: x["cls"] for x in out.collect()}
    assert r[768253] == "SNV"
    assert r[768300] == "InDel"
    assert r[55249171] == "MNV"
    assert r[1000] == "other"


def test_best_transcript_topk(spark):
    tx = spark.createDataFrame(
        [
            ("chr1", 1, "A", "G", "NM_001.2", 5.0),
            ("chr1", 1, "A", "G", "NM_002.1", 9.0),
            ("chr1", 2, "C", "T", "NM_003.4", 1.0),
        ],
        "`#CHROM` string, POS int, REF string, ALT string, transcript string, score double",
    )
    pref = spark.createDataFrame([("NM_001.9", 1)], "transcript string, rank int")
    # preference outranks score (version-insensitive match NM_001)
    out = best_transcript(tx, preference=pref, order_cols=["score"])
    r = {x["POS"]: x["transcript"] for x in out.collect()}
    assert r[1] == "NM_001.2"
    assert r[2] == "NM_003.4"
    # without preference: best score wins
    out2 = best_transcript(tx, order_cols=["score"])
    assert {x["POS"]: x["transcript"] for x in out2.collect()}[1] == "NM_002.1"
