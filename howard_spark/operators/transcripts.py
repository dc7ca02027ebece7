"""Transcripts-view machinery: packed per-transcript annotations ->
typed transcript rows (reference create_transcript_view,
/root/reference/howard/objects/variants.py:10506-11616, exercised by
ref tests/test_variants_transcripts.py).

Two source shapes, both turned into ONE exploded relation:

- snpEff-ANN column format (`from_column_format`,
  ref variants.py:10732-10859 + annotation_format_to_table:11202):
  INFO/ANN is a comma-separated list of transcript entries, each entry
  pipe-separated with field names published in the VCF header
  description. Spark: split(',') -> explode -> split('|') -> columns.
  One select, one explode — no per-chromosome INSERT loop; the
  reference's np.vectorize JSON detour disappears entirely.

- parallel-list columns map (`from_columns_map`, ref
  variants.py:10506-10730, dbNSFP style): several INFO fields hold
  ','-separated lists positionally indexed by transcript.
  Spark: arrays_zip(the split arrays) -> explode — a positional zip,
  matching DuckDB's multi-unnest semantics.

Both compose with ``best_transcript`` (operators/variants.py) for the
reference's transcripts_prioritization flow.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.info import info_get


def parse_ann_header(description: str) -> list[str]:
    """Field names from a snpEff ANN header description, e.g.
    "Functional annotations: 'Allele | Annotation | Gene_Name'" ->
    ['Allele', 'Annotation', 'GeneName'] (names cleaned to
    alphanumeric, the reference's convention at variants.py:11270)."""
    m = re.search(r"'(.+?)'", description)
    if not m:
        raise ValueError("invalid ANN header description")
    return ["".join(ch for ch in f if ch.isalnum())
            for f in m.group(1).split(" | ")]


def transcripts_view_from_ann(
    variants: DataFrame,
    ann_header: list[str],
    ann_field: str = "ANN",
    id_field: str = "FeatureID",
    info_col: str = "INFO",
    key_cols: list[str] | None = None,
    uniquify: bool = True,
) -> DataFrame:
    """Explode a packed snpEff-ANN INFO field into one typed row per
    (variant, transcript).

    Plan shape: extract -> split(',') -> explode -> split('|') ->
    getItem per field. All native expressions in one codegen stage;
    the explode is the only row-count change and needs no shuffle.
    """
    key_cols = key_cols or ["#CHROM", "POS", "REF", "ALT"]
    ann_val = F.nullif(info_get(info_col, ann_field), F.lit(""))
    entries = F.split(ann_val, ",")
    if uniquify:
        entries = F.array_distinct(entries)
    df = variants.select(
        *key_cols, info_col,
        F.explode(entries).alias("__entry"),
    )
    parts = F.split(F.col("__entry"), r"\|")
    cols = [
        F.nullif(parts.getItem(i), F.lit("")).alias(name)
        for i, name in enumerate(ann_header)
    ]
    out = df.select(*key_cols, info_col, *cols)
    if id_field not in ann_header:
        raise ValueError(f"{id_field!r} not in ANN header {ann_header}")
    return out.withColumn("transcript", F.col(id_field))


def transcripts_view_from_columns_map(
    variants: DataFrame,
    transcripts_column: str,
    infos_columns: list[str],
    info_col: str = "INFO",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Explode parallel ','-separated INFO lists (dbNSFP style) into
    one row per transcript, zipped positionally (the reference's
    multi-regexp_split_to_table SELECT, variants.py:10640-10678).
    """
    key_cols = key_cols or ["#CHROM", "POS", "REF", "ALT"]
    all_fields = [transcripts_column] + [
        c for c in infos_columns if c != transcripts_column
    ]
    arrays = [
        F.split(F.nullif(info_get(info_col, f), F.lit("")), ",").alias(f"__a_{f}")
        for f in all_fields
    ]
    df = variants.select(*key_cols, info_col, *arrays).where(
        F.col(f"__a_{transcripts_column}").isNotNull()
    )
    zipped = F.arrays_zip(*[F.col(f"__a_{f}") for f in all_fields])
    df = df.select(*key_cols, info_col, F.explode(zipped).alias("__z"))
    cols = [
        F.nullif(F.col("__z").getField(f"__a_{f}"), F.lit("")).alias(f)
        for f in all_fields
    ]
    out = df.select(*key_cols, info_col, *cols)
    return out.withColumn("transcript", F.col(transcripts_column))


def prioritize_transcripts(
    view: DataFrame,
    criteria,
    key_cols: list[str] | None = None,
    preference: DataFrame | None = None,
) -> DataFrame:
    """The reference's transcripts_prioritization
    (variants.py:10195-10447): score every transcript row with the
    profile criteria (PZScore/PZFlag/PZComment), then keep the best
    transcript per variant — PZFlag first (PASS > FILTERED), then
    PZScore, then the preference list, then transcript id.

    One window pass over the scored view; no sequential UPDATEs."""
    from .variants import best_transcript, prioritize

    key_cols = key_cols or ["#CHROM", "POS", "REF", "ALT"]
    scored = prioritize(view, criteria).withColumn(
        "__flag_rank", F.when(F.col("PZFlag") == "PASS", 1).otherwise(0)
    )
    best = best_transcript(
        scored, preference=preference,
        order_cols=["__flag_rank", "PZScore"], key_cols=key_cols,
        preference_first=False,  # reference default: scores rank first
    )
    return best.drop("__flag_rank")


def transcripts_to_json(
    transcripts: DataFrame,
    fields: list[str],
    key_cols: list[str] | None = None,
    out_field: str = "transcripts_json",
) -> DataFrame:
    """Collapse a transcripts view back to one row per variant with a
    JSON map transcript -> {field: value} (reference
    transcript_view_to_variants, variants.py:11475-11616)."""
    key_cols = key_cols or ["#CHROM", "POS", "REF", "ALT"]
    entry = F.to_json(F.struct(*[F.col(f) for f in fields]))
    per_tx = F.concat(F.lit('"'), F.col("transcript"), F.lit('":'), entry)
    return (
        transcripts.groupBy(*key_cols)
        .agg(
            F.concat(
                F.lit("{"),
                F.concat_ws(",", F.array_sort(F.collect_list(per_tx))),
                F.lit("}"),
            ).alias(out_field)
        )
    )


def transcripts_check(
    transcripts_view: DataFrame,
    expected: DataFrame,
    transcript_col: str = "transcript",
) -> dict:
    """The reference's ``transcripts_check`` plugin
    (/root/reference/plugins/transcripts_check/__main__.py:74-178):
    compare the transcripts present in a generated transcripts view
    against an expected list, version-aware — each transcript splits on
    '.' into (id, version) and the set algebra runs on the distinct
    (id, version) pairs, so NM_1.2 and NM_1.3 are different entries
    while duplicates collapse.

    Returns the reference's stats dict: available / list /
    intersection / union / percent / missing / missing_list (the
    missing transcripts re-joined as ``id[.version]``). All set ops are
    distinct-aggregations on two tiny key columns — the only driver
    materialization is the missing list itself."""
    def keyed(df: DataFrame) -> DataFrame:
        parts = F.split(F.col(transcript_col), r"\.")
        return df.select(
            parts.getItem(0).alias("tid"),
            F.when(F.size(parts) > 1, parts.getItem(1)).alias("tver"),
        ).distinct()

    have = keyed(transcripts_view)
    want = keyed(expected)
    n_have = have.count()
    n_want = want.count()
    # version-less transcripts carry a NULL tver: the set algebra must
    # treat NULL = NULL as a match, so the joins use eqNullSafe
    h = have.select(F.col("tid").alias("h_tid"), F.col("tver").alias("h_tver"))
    cond = (F.col("tid") == F.col("h_tid")) & F.col("tver").eqNullSafe(F.col("h_tver"))
    n_inter = want.join(h, cond, "inner").count()
    missing = want.join(h, cond, "left_anti")
    missing_list = sorted(
        r["tid"] + (f".{r['tver']}" if r["tver"] is not None else "")
        for r in missing.collect()
    )
    return {
        "available": n_have,
        "list": n_want,
        "intersection": n_inter,
        "union": n_have + n_want - n_inter,
        "percent": n_inter / n_want if n_want else 0.0,
        "missing": len(missing_list),
        "missing_list": missing_list,
    }
