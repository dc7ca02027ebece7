"""Transcripts-view machinery (reference create_transcript_view,
ref tests/test_variants_transcripts.py is the model)."""

import json

from pyspark.sql import functions as F

from howard_spark.operators.transcripts import (
    parse_ann_header,
    transcripts_to_json,
    transcripts_view_from_ann,
    transcripts_view_from_columns_map,
)
from howard_spark.operators.variants import best_transcript

KEYS = ["#CHROM", "POS", "REF", "ALT"]
SCHEMA = "`#CHROM` string, POS long, REF string, ALT string, INFO string"


def test_parse_ann_header():
    desc = ("Functional annotations: 'Allele | Annotation | Gene_Name | "
            "Feature_ID | HGVS.c'")
    assert parse_ann_header(desc) == [
        "Allele", "Annotation", "GeneName", "FeatureID", "HGVSc"]


def test_view_from_ann(spark):
    rows = [
        ("chr1", 100, "A", "T",
         "DP=12;ANN=T|missense|G1|NM_01.2|c.5A>T,T|synonymous|G1|NM_02.1|c.7G>A"),
        ("chr1", 200, "C", "G", "DP=3"),  # no ANN -> no rows
        ("chr2", 300, "G", "C", "ANN=C|stop_gained|G2|NM_03|"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    view = transcripts_view_from_ann(
        df, ann_header=["Allele", "Annotation", "GeneName", "FeatureID", "HGVSc"],
        id_field="FeatureID")
    got = {(r["POS"], r["transcript"]): (r["Annotation"], r["HGVSc"])
           for r in view.collect()}
    assert got == {
        (100, "NM_01.2"): ("missense", "c.5A>T"),
        (100, "NM_02.1"): ("synonymous", "c.7G>A"),
        (300, "NM_03"): ("stop_gained", None),  # trailing empty -> NULL
    }


def test_view_from_ann_uniquify(spark):
    rows = [("chr1", 100, "A", "T", "ANN=T|ms|G1|NM_01|x,T|ms|G1|NM_01|x")]
    df = spark.createDataFrame(rows, SCHEMA)
    view = transcripts_view_from_ann(
        df, ann_header=["Allele", "Annotation", "GeneName", "FeatureID", "X"],
        id_field="FeatureID")
    assert view.count() == 1  # duplicate entries uniquified


def test_view_from_columns_map(spark):
    rows = [
        ("chr1", 100, "A", "T",
         "Ensembl_transcriptid=ENST01,ENST02;genename=G1,G1;score=0.9,0.2"),
        ("chr1", 200, "C", "G", "DP=3"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    view = transcripts_view_from_columns_map(
        df, "Ensembl_transcriptid", ["genename", "score"])
    got = {r["transcript"]: (r["genename"], r["score"]) for r in view.collect()}
    assert got == {"ENST01": ("G1", "0.9"), "ENST02": ("G1", "0.2")}


def test_view_feeds_best_transcript(spark):
    rows = [
        ("chr1", 100, "A", "T",
         "Ensembl_transcriptid=ENST01,ENST02;score=0.2,0.9"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    view = transcripts_view_from_columns_map(
        df, "Ensembl_transcriptid", ["score"]
    ).withColumn("score_f", F.col("score").cast("double"))
    best = best_transcript(view, order_cols=["score_f"]).collect()
    assert len(best) == 1 and best[0]["transcript"] == "ENST02"


def test_transcripts_to_json(spark):
    rows = [
        ("chr1", 100, "A", "T",
         "Ensembl_transcriptid=ENST01,ENST02;genename=G1,G2"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    view = transcripts_view_from_columns_map(
        df, "Ensembl_transcriptid", ["genename"])
    out = transcripts_to_json(view, fields=["genename"]).collect()
    parsed = json.loads(out[0]["transcripts_json"])
    assert parsed == {"ENST01": {"genename": "G1"},
                      "ENST02": {"genename": "G2"}}


def test_prioritize_transcripts(spark):
    from howard_spark.operators.transcripts import prioritize_transcripts
    from howard_spark.operators.variants import Criterion

    rows = [
        ("chr1", 100, "A", "T",
         "Ensembl_transcriptid=ENST01,ENST02,ENST03;score=0.1,0.9,0.9"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    view = transcripts_view_from_columns_map(
        df, "Ensembl_transcriptid", ["score"])
    crits = [Criterion(field="score", op="gt", value=0.5, score=10)]
    best = prioritize_transcripts(view, crits).collect()
    assert len(best) == 1
    # ENST02 and ENST03 tie on PZScore=10; transcript asc breaks the tie
    assert best[0]["transcript"] == "ENST02"
    assert best[0]["PZScore"] == 10

    # default: scores rank first, preference only breaks ties
    pref3 = spark.createDataFrame([("ENST03", 1)], "transcript string, rank long")
    best2 = prioritize_transcripts(view, crits, preference=pref3).collect()
    assert best2[0]["transcript"] == "ENST03"  # tie at 10 -> pref decides

    # a preference for the LOW-scoring transcript cannot beat the score
    pref1 = spark.createDataFrame([("ENST01", 1)], "transcript string, rank long")
    best3 = prioritize_transcripts(view, crits, preference=pref1).collect()
    assert best3[0]["transcript"] == "ENST02"  # score outranks preference

    # ...unless forced (the reference's prioritization_transcripts_force)
    from howard_spark.operators.variants import best_transcript, prioritize
    forced = best_transcript(prioritize(view, crits), preference=pref1,
                             order_cols=["PZScore"], preference_first=True).collect()
    assert forced[0]["transcript"] == "ENST01"


def test_transcripts_check_stats(spark):
    """Version-aware set algebra vs the expected list (ref
    transcripts_check plugin semantics)."""
    from howard_spark.operators.transcripts import transcripts_check

    view = spark.createDataFrame(
        [("NM_1.2",), ("NM_1.2",), ("NM_2.1",), ("NM_3",)],
        "transcript string")
    expected = spark.createDataFrame(
        [("NM_1.2",), ("NM_1.3",), ("NM_3",), ("NM_9.9",)],
        "transcript string")
    s = transcripts_check(view, expected)
    assert s["available"] == 3          # NM_1.2, NM_2.1, NM_3 (deduped)
    assert s["list"] == 4
    assert s["intersection"] == 2       # NM_1.2 and NM_3
    assert s["union"] == 5
    assert s["percent"] == 0.5
    assert s["missing"] == 2
    assert s["missing_list"] == ["NM_1.3", "NM_9.9"]  # version-sensitive
