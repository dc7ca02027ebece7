"""Engine facade + genotype-function parity tests (golden values in the
reference's probe style)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from howard_spark.engine import Engine
from howard_spark.functions.genotypes import (
    barcode,
    findbypipeline,
    format_field,
    genotype_concordance,
    genotype_stats,
    trio_inheritance,
    vaf_from_ad,
)
from howard_spark.operators.variants import Criterion


@pytest.fixture(scope="module")
def trio_df(spark):
    rows = [
        # FORMAT, father, mother, child
        ("chr1", 100, "A", "G", "x", "GT:DP:AD", "0/0:30:30,0", "0/0:28:28,0", "0/1:25:15,10"),
        ("chr1", 200, "C", "T", "x", "GT:DP:AD", "0/1:20:10,10", "0/1:22:11,11", "1/1:40:0,40"),
        ("chr1", 300, "G", "A", "x", "GT:DP:AD", "0/1:15:9,6", "0/0:18:18,0", "0/1:21:14,7"),
        ("chr2", 400, "T", "C", "x", "GT:DP", "./.", "0/0:10", "0/0:12"),
    ]
    return spark.createDataFrame(
        rows,
        "`#CHROM` string, POS int, REF string, ALT string, INFO string,"
        "FORMAT string, S1 string, S2 string, S3 string",
    )


def test_format_field_extraction(spark, trio_df):
    out = trio_df.select(
        "POS",
        format_field("S3", "FORMAT", "DP").alias("dp"),
        format_field("S3", "FORMAT", "AD").alias("ad"),
        format_field("S3", "FORMAT", "NOPE").alias("absent"),
    ).collect()
    r = {x["POS"]: x for x in out}
    assert r[100]["dp"] == "25" and r[100]["ad"] == "15,10"
    assert r[400]["ad"] is None  # AD absent from that row's FORMAT
    assert all(x["absent"] is None for x in out)


def test_findbypipeline_and_concordance(spark, trio_df):
    out = trio_df.select(
        "POS",
        findbypipeline("FORMAT", ["S1", "S2", "S3"]).alias("fbp"),
        genotype_concordance("FORMAT", ["S1", "S2", "S3"]).alias("conc"),
    ).collect()
    r = {x["POS"]: x for x in out}
    assert r[100]["fbp"] == "1/3" and r[100]["conc"] is False
    assert r[200]["fbp"] == "3/3" and r[200]["conc"] is False
    assert r[400]["fbp"] == "0/3" and r[400]["conc"] is True  # only 0/0 informative


def test_barcode_and_trio(spark, trio_df):
    out = trio_df.select(
        "POS",
        barcode("FORMAT", ["S1", "S2", "S3"]).alias("bc"),
        trio_inheritance("FORMAT", "S1", "S2", "S3").alias("mode"),
    ).collect()
    r = {x["POS"]: x for x in out}
    assert r[100]["bc"] == "001" and r[100]["mode"] == "denovo"
    assert r[200]["bc"] == "112" and r[200]["mode"] == "recessive"
    assert r[300]["bc"] == "101" and r[300]["mode"] == "dominant"
    assert r[400]["bc"] == "?00"


def test_vaf_and_stats(spark, trio_df):
    out = trio_df.select(
        "POS", vaf_from_ad("FORMAT", "S3").alias("vaf"),
        *[v.alias(k) for k, v in genotype_stats("FORMAT", ["S1", "S2", "S3"]).items()],
    ).collect()
    r = {x["POS"]: x for x in out}
    assert r[100]["vaf"] == 0.4  # 10/25
    assert r[200]["vaf"] == 1.0
    assert r[100]["DP_min"] == 25.0 and r[100]["DP_max"] == 30.0
    assert abs(r[100]["DP_mean"] - (30 + 28 + 25) / 3) < 1e-6
    assert r[400]["DP_n"] == 2  # ./. sample contributes nothing


def test_engine_pipeline_end_to_end(spark, trio_df, tmp_path):
    ann = spark.createDataFrame(
        [("chr1", 100, "A", "G", 0.321)],
        "`#CHROM` string, POS int, REF string, ALT string, nci60 double",
    )
    eng = Engine(spark, df=trio_df)
    eng.annotation(ann).calculation_variant_class().explode_infos(["nci60", "VARTYPE"])
    eng.prioritization([
        Criterion(field="INFO/nci60", op="gte", value=0.3, score=10, comment="known"),
    ])
    # reference-style golden probe through the SQL surface
    hit = eng.query(
        "SELECT 1 FROM variants WHERE `#CHROM`='chr1' AND POS=100 "
        "AND INFO LIKE '%nci60=0.321%' AND PZScore = 10"
    )
    assert hit.count() == 1
    assert eng.query("SELECT count(*) c FROM variants WHERE PZScore = 0").first()["c"] == 3

    stats = eng.stats()
    assert stats["n"] == 4 and stats["n_snv"] == 4
    assert stats["per_chrom"]["chr1"] == 3

    out = str(tmp_path / "out.tsv")
    eng.export(out, fmt="tsv", order_by=["POS"], schema_sidecar=True)
    back = spark.read.option("sep", "\t").option("header", "true").csv(out)
    assert back.count() == 4


def test_engine_encoded_roundtrip(spark, trio_df, tmp_path):
    eng = Engine(spark, df=trio_df)
    m = eng.encode(str(tmp_path / "enc"), keys=["#CHROM", "POS"], npartitions=2)
    assert m["rows"] == 4
    back = Engine.from_encoded(spark, str(tmp_path / "enc"), trio_df.schema)
    got = back.query("SELECT * FROM variants ORDER BY POS").collect()
    want = trio_df.orderBy("POS").collect()
    assert got == want


def test_engine_process_param_pipeline(spark, trio_df, tmp_path):
    """The `process` tool surface: one param dict drives
    annotate -> calculate -> prioritize -> query -> export
    (ref tools/process.py)."""
    import json

    from howard_spark.functions.info import info_get

    ann = spark.createDataFrame(
        [("chr1", 100, "A", "G", "0.01"), ("chr1", 200, "C", "T", "0.30")],
        "`#CHROM` string, POS int, REF string, ALT string, AF string")
    ann_path = str(tmp_path / "ann.parquet")
    ann.write.parquet(ann_path)
    out_path = str(tmp_path / "out.tsv")

    param = {
        "annotations": [{"path": ann_path, "fields": ["AF"]}],
        "calculations": ["VARTYPE"],
        "prioritizations": [
            {"field": "POS", "op": "lt", "value": 250, "score": 5},
        ],
        "query": "SELECT `#CHROM`, POS, INFO, PZScore FROM variants "
                 "ORDER BY POS",
        "output": {"path": out_path, "fmt": "tsv"},
    }
    eng = Engine(spark, df=trio_df)
    out = eng.process(param)
    rows = {r["POS"]: r for r in out.collect()}
    assert "AF=0.01" in rows[100]["INFO"]
    assert "VARTYPE=SNV" in rows[100]["INFO"]
    assert rows[100]["PZScore"] == 5 and rows[400]["PZScore"] == 0
    # exported sink exists and re-reads
    back = spark.read.option("sep", "\t").option("header", "true").csv(out_path)
    assert back.count() == 4

    # CLI-style param JSON round-trips
    p = tmp_path / "param.json"
    p.write_text(json.dumps(param))
    assert json.loads(p.read_text())["query"].startswith("SELECT")
