"""Engine.minimalize — the reference's minimalize plugin
(/root/reference/plugins/minimalize/__main__.py:78-116): blank
INFO/ID/FILTER to '.', QUAL to NULL, samples to GT-only, or drop
samples; optional explode-INFO-first for database builds."""

import pytest

from howard_spark.engine import Engine


@pytest.fixture()
def vcf_df(spark):
    rows = [
        ("chr1", 100, "rs1", "A", "T", 50.0, "PASS",
         "DP=10;AF=0.5;GENE=BRCA1", "GT:DP:AD", "0/1:10:5,5", "1/1:8:0,8"),
        ("chr2", 200, ".", "G", "C", None, "q10",
         "DP=3;GENE=TP53", "GT:DP", "0/0:3", "./.:0"),
    ]
    return spark.createDataFrame(
        rows,
        "`#CHROM` string, POS long, ID string, REF string, ALT string, "
        "QUAL double, FILTER string, INFO string, FORMAT string, "
        "S1 string, S2 string")


def test_minimalize_fields_blanked(spark, vcf_df):
    eng = Engine(spark, df=vcf_df).minimalize(
        info=True, id=True, qual=True, filter=True)
    out = eng.df.orderBy("POS").collect()
    for r in out:
        assert r["INFO"] == "." and r["ID"] == "." and r["FILTER"] == "."
        assert r["QUAL"] is None
    # untouched columns survive
    assert out[0]["REF"] == "A" and out[0]["S1"] == "0/1:10:5,5"
    # QUAL keeps its original (numeric) type, as in the reference
    assert dict(eng.df.dtypes)["QUAL"] == "double"


def test_minimalize_samples_keep_gt_only(spark, vcf_df):
    out = (Engine(spark, df=vcf_df).minimalize(samples=True)
           .df.orderBy("POS").collect())
    assert all(r["FORMAT"] == "GT" for r in out)
    assert out[0]["S1"] == "0/1" and out[0]["S2"] == "1/1"
    assert out[1]["S1"] == "0/0" and out[1]["S2"] == "./."
    assert out[0]["INFO"].startswith("DP=")  # INFO untouched


def test_minimalize_remove_samples(spark, vcf_df):
    eng = Engine(spark, df=vcf_df).minimalize(remove_samples=True)
    assert set(eng.df.columns) == {"#CHROM", "POS", "ID", "REF", "ALT",
                                   "QUAL", "FILTER", "INFO"}


def test_minimalize_explode_then_blank_keeps_tags(spark, vcf_df):
    """The database-build pattern: explode INFO tags into columns,
    THEN blank the packed string — tags survive as typed columns."""
    eng = Engine(spark, df=vcf_df).minimalize(
        info=True, explode_infos_fields=["DP", "GENE"])
    out = eng.df.orderBy("POS").collect()
    assert out[0]["INFO"] == "."
    assert out[0]["INFO/DP"] == "10" and out[0]["INFO/GENE"] == "BRCA1"
    assert out[1]["INFO/GENE"] == "TP53"


def test_minimalize_cli_smoke(spark, vcf_df, tmp_path, monkeypatch):
    src = str(tmp_path / "in.parquet")
    dst = str(tmp_path / "out.parquet")
    vcf_df.write.parquet(src)

    # main() reuses the active session via getOrCreate and stops it on
    # exit — neuter stop so the suite's shared session survives
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    from howard_spark.__main__ import main

    rc = main(["minimalize", "--input", src, "--output", dst,
               "--minimalize-info", "--minimalize-id",
               "--minimalize-samples"])
    assert rc == 0
    out = spark.read.parquet(dst).orderBy("POS").collect()
    assert all(r["INFO"] == "." and r["ID"] == "." and r["FORMAT"] == "GT"
               for r in out)
    assert out[0]["S1"] == "0/1"
