"""Calculation dispatch registry (reference
config/calculations_config.json; dispatch variants.py:8365-8531;
ref tests/test_variants_calculations.py is the model)."""

import json

import pytest

from pyspark.sql import functions as F

from howard_spark.functions.calculations import CALCULATIONS, apply_calculation
from howard_spark.functions.info import info_get

SCHEMA = ("`#CHROM` string, POS long, REF string, ALT string, INFO string, "
          "FORMAT string, S1 string, S2 string, S3 string")

ROWS = [
    ("chr1", 100, "A", "T", "DP=10", "GT:AD:DP", "0/1:5,5:10", "0/0:9,1:10", "1/1:0,8:8"),
    ("chr1", 200, "AC", "A", "DP=3", "GT:AD:DP", "./.:.:.", "0/1:3,4:7", "0/0:6,0:6"),
    ("chr1", 300, "G", "GT", "SVTYPE=DUP", "GT:AD:DP", "0/0:4,0:4", "0/0:5,0:5", "0/0:2,0:2"),
]

ANN_ROW = [(
    "chr7", 55249063, "G", "A",
    "ANN=A|missense_variant|MODERATE|EGFR|ENSG00000146648|transcript|NM_005228.5"
    "|protein_coding|20/28|c.2369C>T|p.Thr790Met|2625/9821|2369/3633|790/1210||"
    ",A|upstream_gene_variant|MODIFIER|EGFR-AS1|ENSG00000280411|transcript|NR_047551.1"
    "|pseudogene||n.123A>T|||||4000|",
    "GT", "0/1", "0/0", "0/0",
)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _info(row, tag):
    for part in row["INFO"].split(";"):
        k, _, v = part.partition("=")
        if k == tag:
            return v
    return None


def test_registry_covers_reference_config():
    expected = {
        "variant_chr_pos_alt_ref", "VARTYPE", "snpeff_hgvs",
        "snpeff_ann_explode", "snpeff_ann_explode_uniquify",
        "snpeff_ann_explode_json", "NOMEN", "FINDBYPIPELINE",
        "FINDBYSAMPLE", "GENOTYPECONCORDANCE", "BARCODE", "BARCODEFAMILY",
        "TRIO", "VAF", "VAF_stats", "DP_stats", "variant_id",
    }
    assert expected <= set(CALCULATIONS)


def test_vartype(df):
    out = {r["POS"]: _info(r, "VARTYPE")
           for r in apply_calculation(df, "VARTYPE").collect()}
    assert out == {100: "SNV", 200: "INDEL", 300: "DUP"}  # SVTYPE wins at 300


def test_variant_ids(df):
    out = apply_calculation(df, "variant_chr_pos_alt_ref").collect()
    assert _info(out[0], "variant_chr_pos_alt_ref") == "chr1_100_A_T"
    out2 = apply_calculation(df, "variant_id").collect()
    assert len(_info(out2[0], "variant_id")) == 32  # md5 hex


def test_findbysample_and_pipeline(df):
    samples = ["S1", "S2", "S3"]
    for name, tag in [("FINDBYPIPELINE", "findbypipeline"),
                      ("FINDBYSAMPLE", "findbysample")]:
        out = {r["POS"]: _info(r, tag)
               for r in apply_calculation(df, name, samples=samples, tag=tag).collect()}
        assert out == {100: "2/3", 200: "1/3", 300: "0/3"}


def test_barcode_and_concordance(df):
    samples = ["S1", "S2", "S3"]
    out = {r["POS"]: _info(r, "barcode")
           for r in apply_calculation(df, "BARCODE", samples=samples, tag="barcode").collect()}
    assert out == {100: "102", 200: "?10", 300: "000"}
    conc = {r["POS"]: _info(r, "genotypeconcordance")
            for r in apply_calculation(df, "GENOTYPECONCORDANCE", samples=samples,
                                       tag="genotypeconcordance").collect()}
    assert conc == {100: "FALSE", 200: "FALSE", 300: "TRUE"}


def test_barcode_family(df):
    samples = ["S1", "S2", "S3"]
    out = apply_calculation(df, "BARCODEFAMILY", samples=samples,
                            family_pedigree=["S1", "S3"]).collect()
    r = {row["POS"]: row for row in out}
    assert r[100]["FORMAT"] == "GT:AD:DP:BCF:BCFS"
    # pedigree barcode over S1,S3 only
    assert r[100]["S1"].endswith(":12:S1,S3")
    assert r[100]["S3"].endswith(":12:S1,S3")
    assert r[100]["S2"].endswith(":.:.")  # non-pedigree sample masked


def test_snpeff_hgvs(spark):
    df = spark.createDataFrame(ANN_ROW, SCHEMA)
    out = apply_calculation(df, "snpeff_hgvs").collect()[0]
    got = _info(out, "snpeff_hgvs")
    assert got == (
        "ENSG00000146648:NM_005228.5:exon20:c.2369C>T:p.Thr790Met,"
        "ENSG00000280411:NR_047551.1:n.123A>T"
    )


def test_snpeff_ann_explode(spark):
    df = spark.createDataFrame(ANN_ROW, SCHEMA)
    out = apply_calculation(df, "snpeff_ann_explode").collect()[0]
    assert out["ANN_GeneName"] == "EGFR,EGFR-AS1"
    assert out["ANN_HGVSc"] == "c.2369C>T,n.123A>T"
    uniq = apply_calculation(df, "snpeff_ann_explode_uniquify").collect()[0]
    assert uniq["ANN_FeatureType"] == "transcript"  # deduped
    js = apply_calculation(df, "snpeff_ann_explode_json").collect()[0]
    parsed = json.loads(js["ann_json"])
    assert parsed["ANN_GeneName"] == "EGFR,EGFR-AS1"


def test_vaf_and_stats(df):
    samples = ["S1", "S2", "S3"]
    out = apply_calculation(df, "VAF", samples=samples).collect()
    r100 = [r for r in out if r["POS"] == 100][0]
    assert r100["FORMAT"].endswith(":VAF")
    assert r100["S1"].endswith(":0.5")
    stats = apply_calculation(df, "DP_stats", samples=samples).collect()
    r = [x for x in stats if x["POS"] == 100][0]
    assert _info(r, "DP_n") == "3"
    assert _info(r, "DP_max") == "10.0"


def test_trio(df):
    out = apply_calculation(
        df, "TRIO", samples=["S1", "S2", "S3"],
        family_pedigree={"father": "S1", "mother": "S2", "child": "S3"},
        tag="trio").collect()
    got = {r["POS"]: _info(r, "trio") for r in out}
    assert got[100] == "dominant"   # barcode 102: one carrier parent
    assert got[300] is None or got[300] == "unknown"


def test_unknown_calculation_raises(df):
    with pytest.raises(ValueError, match="unknown calculation"):
        apply_calculation(df, "NOPE")
