"""Gate queries for the HGVS annotation kernel (F9).

The Spark side runs the REAL distributed pipeline (broadcast interval
join + mapInPandas naming kernel) over the deterministic synthetic
fixture; the DuckDB oracle pins the hand-derived expected names as a
literal table. A regression anywhere in the chain (normalization,
coordinate mapping, formatting, join, kernel plumbing) flips the hash.
"""

from __future__ import annotations

from . import query

_EXPECTED = [
    # (chrom, pos, ref, alt, hgvs) — hand-derived in tests/test_hgvs.py
    ("chrT", 73, "G", "A", "TX1(GENE1):c.-31+3G>A"),
    ("chrT", 120, "T", "C", "TX1(GENE1):c.-11T>C"),
    ("chrT", 135, "A", "T", "TX1(GENE1):c.5A>T"),
    ("chrT", 145, "A", "G", "TX1(GENE1):c.15A>G"),
    ("chrT", 149, "C", "CA", "TX1(GENE1):c.25dupA"),
    ("chrT", 149, "CA", "C", "TX1(GENE1):c.25delA"),
    ("chrT", 149, "CAAAAAA", "C", "TX1(GENE1):c.20_25del6"),
    ("chrT", 160, "CT", "AG", "TX1(GENE1):c.30_31delCTinsAG"),
    ("chrT", 345, "A", "G", "TX1(GENE1):c.*5A>G"),
    ("chrT", 500, "T", "C", "TX2(GENE2):c.61A>G"),
]

_EXPECTED_PROTEIN = [
    ("chrT", 135, "A", "T", "TX1(GENE1):c.5A>T,TX1(GENE1):p.Gln2Leu"),
    ("chrT", 500, "T", "C", "TX2(GENE2):c.61A>G,TX2(GENE2):p.Val21Val"),
]


def _values_sql(rows) -> str:
    vals = ",\n        ".join(
        f"('{c}', {p}, '{r}', '{a}', '{h}')" for c, p, r, a, h in rows
    )
    return f"""
    SELECT chrom, CAST(pos AS BIGINT) AS pos, ref, alt, hgvs
    FROM (VALUES
        {vals}
    ) AS t(chrom, pos, ref, alt, hgvs)
    """


def _run(spark, rows, **opts):
    from ..functions.hgvs_fixture import demo_genome, demo_transcripts
    from .hgvs_spark import annotate_hgvs

    df = spark.createDataFrame(
        [(c, p, r, a) for c, p, r, a, _ in rows],
        "chrom string, pos long, ref string, alt string",
    )
    return annotate_hgvs(df, demo_transcripts(), demo_genome(), **opts)


@query("q60_hgvs_names", _values_sql(_EXPECTED))
def q60(spark, sf):
    """HGVS cDNA names: SNV / UTR / intronic / del / dup / delins /
    length-notation / minus-strand, end-to-end through the Spark
    pipeline (ref variants.py:7833-7939, hgvs.py:969, utils.py:723)."""
    return _run(spark, _EXPECTED)


@query("q61_hgvs_protein", _values_sql(_EXPECTED_PROTEIN))
def q61(spark, sf):
    """HGVS with add_protein: c. name + p. name per transcript (ref
    annotation_hgvs add_protein branch, variants.py:7919-7939)."""
    return _run(spark, _EXPECTED_PROTEIN, add_protein=True)
