"""Gate queries for the transcripts-view machinery.

The driver tables carry no packed ANN column, so both engines first
SYNTHESIZE the identical snpEff-style packed INFO string from orders
columns (deterministic arithmetic), then the Spark side runs the REAL
view machinery (transcripts_view_from_ann / best_transcript) while the
DuckDB oracle re-derives the expected relation with its own
split/unnest primitives — exercising extraction, explode, field
typing, and top-1-per-key end-to-end on 15k+ rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, t

# shared construction: per order, (o_orderkey % 3) + 1 ANN entries
#   entry k = "TX{okey}-{k}|G{ckey%50}|{(okey*7 + k*13) % 100}"
_ANN_ENTRY_SPARK = (
    "concat('TX', o_orderkey, '-', k, '|G', pmod(o_custkey, 50), "
    "'|', pmod(o_orderkey * 7 + k * 13, 100))"
)

_SYNTH_SQL = """
        SELECT o_orderkey,
               'ANN=' || string_agg(
                   'TX' || o_orderkey || '-' || k || '|G' || (o_custkey % 50)
                   || '|' || ((o_orderkey * 7 + k * 13) % 100),
                   ',' ORDER BY k) AS info
        FROM orders, (SELECT unnest(range(3)) AS k) ks
        WHERE k <= o_orderkey % 3
        GROUP BY o_orderkey
"""

_VIEW_SQL = f"""
        SELECT o_orderkey,
               string_split(entry, '|')[1] AS transcript,
               string_split(entry, '|')[2] AS gene,
               CAST(string_split(entry, '|')[3] AS BIGINT) AS score
        FROM (
            SELECT o_orderkey,
                   unnest(string_split(regexp_extract(info, 'ANN=([^;]*)', 1), ',')) AS entry
            FROM ({_SYNTH_SQL})
        )
"""


def _synth_variants(spark, sf):
    # orders is one parquet file with ONE row group, so the synth +
    # explode + ANN-typing pipeline would run in a single scan task at
    # any SF; round-robin to the core count first (guide §2.5 input
    # skew: one unsplittable input). Measured q62 0.67 -> 0.40 s at
    # sf0.1; the stage is single-core-bound at the driver's sf1.0.
    o = t(spark, sf, "orders").repartition(
        spark.sparkContext.defaultParallelism)
    entries = F.expr(
        f"transform(sequence(0, pmod(o_orderkey, 3)), k -> {_ANN_ENTRY_SPARK})"
    )
    return o.select(
        "o_orderkey",
        F.concat(F.lit("ANN="), F.array_join(entries, ",")).alias("INFO"),
    )


def _view(spark, sf):
    from .transcripts import transcripts_view_from_ann

    v = _synth_variants(spark, sf)
    view = transcripts_view_from_ann(
        v,
        ann_header=["FeatureID", "GeneName", "RawScore"],
        id_field="FeatureID",
        key_cols=["o_orderkey"],
    )
    return view.select(
        "o_orderkey",
        "transcript",
        F.col("GeneName").alias("gene"),
        F.col("RawScore").cast("long").alias("score"),
    )


@query("q62_transcripts_view", _VIEW_SQL)
def q62(spark, sf):
    """snpEff-ANN packed string -> typed transcript rows (reference
    annotation_format_to_table, variants.py:11202-11430): one explode,
    field typing, transcript id projection."""
    return _view(spark, sf)


# full snpEff 16-field layout synthesized per (order, k) in BOTH engines:
#   GeneID=ENSG{ck%50}, FeatureID=TX{ok}-{k}, Rank={(ok*3+k)%7}/10,
#   HGVS.c=c.{(ok*7+k*13)%100}A>G, HGVS.p=p.Thr{k}Met
_FULL_ANN_ENTRY_SPARK = (
    "concat('A|missense|MODERATE|GENE', pmod(o_custkey, 50), "
    "'|ENSG', pmod(o_custkey, 50), '|transcript|TX', o_orderkey, '-', k, "
    "'|coding|', pmod(o_orderkey * 3 + k, 7), '/10"
    "|c.', pmod(o_orderkey * 7 + k * 13, 100), 'A>G"
    "|p.Thr', k, 'Met')"
)

_EXPECTED_HGVS_SQL = """
        SELECT o_orderkey,
               string_agg(
                   'ENSG' || (o_custkey % 50) || ':TX' || o_orderkey || '-' || k
                   || ':exon' || ((o_orderkey * 3 + k) % 7)
                   || ':c.' || ((o_orderkey * 7 + k * 13) % 100) || 'A>G'
                   || ':p.Thr' || k || 'Met',
                   ',' ORDER BY k) AS snpeff_hgvs
        FROM orders, (SELECT unnest(range(3)) AS k) ks
        WHERE k <= o_orderkey % 3
        GROUP BY o_orderkey
"""


@query("q64_snpeff_hgvs", _EXPECTED_HGVS_SQL)
def q64(spark, sf):
    """snpeff_hgvs through the REAL calculation registry (ref
    extract_snpeff_hgvs, commons.py:806-875): the Spark side packs full
    16-field snpEff ANN entries into INFO, dispatches
    apply_calculation('snpeff_hgvs'), and returns the INFO-extracted
    result; the oracle constructs the expected gene:feature:exon:c.:p.
    strings from the same deterministic arithmetic."""
    from ..functions.calculations import apply_calculation
    from ..functions.info import info_get

    o = t(spark, sf, "orders").repartition(
        spark.sparkContext.defaultParallelism)  # same 1-row-group reason
    entries = F.expr(
        f"transform(sequence(0, pmod(o_orderkey, 3)), k -> {_FULL_ANN_ENTRY_SPARK})"
    )
    v = o.select(
        "o_orderkey",
        F.concat(F.lit("ANN="), F.array_join(entries, ",")).alias("INFO"),
    )
    out = apply_calculation(v, "snpeff_hgvs")
    return out.select(
        "o_orderkey", info_get("INFO", "snpeff_hgvs").alias("snpeff_hgvs")
    )


@query(
    "q63_best_transcript",
    f"""
    SELECT o_orderkey, transcript, gene, score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderkey ORDER BY score DESC, transcript ASC
        ) AS rn
        FROM ({_VIEW_SQL})
    )
    WHERE rn = 1
    """,
)
def q63(spark, sf):
    """Transcripts view -> top-1 per key (reference
    transcripts_prioritization, variants.py:10195-10447, composing the
    view with the J6/W1 window)."""
    from .variants import best_transcript

    return best_transcript(
        _view(spark, sf), order_cols=["score"], key_cols=["o_orderkey"]
    ).select("o_orderkey", "transcript", "gene", "score")
