"""Distributed HGVS annotation (reference F9, annotation_hgvs at
/root/reference/howard/objects/variants.py:7833-7939).

Spark-first decomposition:
  1. variant x transcript matching is a broadcast INTERVAL JOIN on
     (chrom, tx_start <= pos <= tx_end) — pure JVM, no Python;
  2. per-variant name formatting runs in ONE mapInPandas kernel with
     the transcript models + genome broadcast to every executor — the
     justified per-row Python kernel (deeply branchy string/coordinate
     logic over broadcast lookups, nothing to vectorize).

At 100 TB: the transcript table is tiny (~100k rows genome-wide) so
the join broadcasts; the kernel is embarrassingly parallel per
partition; the genome is served from a broadcast dict (real
deployments would memory-map a FASTA per executor — same pattern as
the reference's per-process pyfaidx handle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.hgvs import TranscriptModel, format_hgvs_name


def transcripts_to_df(spark, transcripts: dict[str, TranscriptModel]) -> DataFrame:
    """Transcript SPANS as a (broadcastable) DataFrame — the interval
    side of the variant x transcript join. 1-based inclusive bounds."""
    rows = []
    seen = set()
    for tm in transcripts.values():
        if tm.full_name in seen:
            continue
        seen.add(tm.full_name)
        rows.append((tm.chrom, tm.tx_start + 1, tm.tx_end, tm.full_name))
    return spark.createDataFrame(rows, "chrom string, tx_lo long, tx_hi long, tx_name string")


def annotate_hgvs(
    variants: DataFrame,
    transcripts: dict[str, TranscriptModel],
    genome,
    chrom_col: str = "chrom",
    pos_col: str = "pos",
    ref_col: str = "ref",
    alt_col: str = "alt",
    use_gene: bool = True,
    use_exon: bool = False,
    use_protein: bool = False,
    add_protein: bool = False,
    full_format: bool = False,
    use_version: bool = False,
) -> DataFrame:
    """Append an ``hgvs`` column: comma-joined HGVS names, one per
    transcript overlapping the variant position (reference semantics:
    annotation_hgvs_partition)."""
    spark = variants.sparkSession
    tx_df = transcripts_to_df(spark, transcripts)

    j = variants.join(
        F.broadcast(tx_df),
        (variants[chrom_col] == tx_df["chrom"])
        & (variants[pos_col] >= tx_df["tx_lo"])
        & (variants[pos_col] <= tx_df["tx_hi"]),
        "left",
    ).drop(tx_df["chrom"]).drop("tx_lo", "tx_hi")

    key_cols = list(variants.columns)
    grouped = j.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list("tx_name")).alias("tx_names")
    )

    bc_tx = spark.sparkContext.broadcast(transcripts)
    bc_genome = spark.sparkContext.broadcast(genome)
    opts = dict(use_gene=use_gene, use_exon=use_exon, use_protein=use_protein,
                full_format=full_format, use_version=use_version)

    out_schema = grouped.drop("tx_names").schema.add("hgvs", "string")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ts = bc_tx.value
        genome_local = bc_genome.value
        for pdf in batches:
            names_out = []
            for chrom, pos, ref, alt, tx_names in zip(
                pdf[chrom_col], pdf[pos_col], pdf[ref_col], pdf[alt_col],
                pdf["tx_names"],
            ):
                names = []
                for txn in tx_names or []:
                    tm = ts.get(txn)
                    if tm is None:
                        continue
                    exon = tm.find_exon_number(int(pos)) if use_exon else None
                    names.append(format_hgvs_name(
                        str(chrom), int(pos), str(ref), str(alt),
                        genome_local, tm, exon=exon, **opts))
                    if add_protein and not use_protein and not full_format:
                        names.append(format_hgvs_name(
                            str(chrom), int(pos), str(ref), str(alt),
                            genome_local, tm, exon=exon,
                            **{**opts, "use_protein": True}))
                names_out.append(",".join(names))
            out = pdf.drop(columns=["tx_names"])
            out["hgvs"] = names_out
            yield out

    return grouped.mapInPandas(kernel, out_schema)
