"""Sinks (SURVEY.md §2.1 S8-S12): parquet / delimited / json / vcf.

The reference streams Arrow batches into per-format writers
(/root/reference/howard/objects/database.py:2124-2926); on Spark the
same surface is ``df.write`` with explicit ordering, partitioning and
single-file options. Genomic sort (bcftools sort analog, S11/O2) is
an ``orderBy`` before write.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

_DELIMS = {"csv": ",", "tsv": "\t", "psv": "|", "tbl": "|", "bed": "\t"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    partition_by: list[str] | None = None,
    order_by: list[str] | None = None,
    single_file: bool = False,
    mode: str = "overwrite",
    header: bool = True,
    schema_sidecar: bool = False,
) -> None:
    from .readers import infer_format

    fmt = fmt or infer_format(path)
    out = df
    if order_by:
        # validated per column like the reference's order_by option
        # (/root/reference/howard/objects/database.py:2320-2343)
        missing = [c for c in order_by if c.split(" ")[0] not in df.columns]
        if missing:
            raise ValueError(f"order_by columns not in schema: {missing}")
        out = out.orderBy(*[c for c in order_by])
    if single_file:
        out = out.coalesce(1)

    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)

    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    elif fmt in _DELIMS:
        w.option("sep", _DELIMS[fmt]).option("header", str(header).lower()).csv(path)
    else:
        raise ValueError(f"unsupported sink format {fmt}")

    if schema_sidecar:
        with open(path + ".schema.json", "w") as fh:
            json.dump(json.loads(df.schema.json()), fh)


def reconstruct_vcf_header(df: DataFrame, meta_lines: list[str] | None = None,
                           info_fields: list[dict] | None = None) -> list[str]:
    """Rebuild the '##' meta block for a VCF export (reference keeps the
    parsed pyVCF header and re-emits it, database.py:2594-2620 +
    the .hdr sidecar protocol). Order: fileformat, provided meta,
    INFO declarations, the '#CHROM...' column line."""
    lines: list[str] = []
    meta = list(meta_lines or [])
    if not any(m.startswith("##fileformat=") for m in meta):
        lines.append("##fileformat=VCFv4.2")
    lines += meta
    for f in info_fields or []:
        fid = f.get("ID")
        if not fid:
            continue
        num = f.get("Number", ".")
        typ = f.get("Type", "String")
        desc = f.get("Description", f.get("desc", fid))
        lines.append(f'##INFO=<ID={fid},Number={num},Type={typ},Description="{desc}">')
    lines.append("\t".join(df.columns))
    return lines


def write_vcf(
    df: DataFrame,
    path: str,
    meta_lines: list[str] | None = None,
    info_fields: list[dict] | None = None,
    sort: bool = True,
) -> None:
    """VCF sink with header reconstruction (S11 full form, reference
    database.py:2594-2620): '##' meta + '#CHROM' line + tab-separated
    body; '.gz' path gzip-compresses. NULLs become '.'.

    Scale note: the body is written DISTRIBUTED (Spark csv, one part
    per partition, genomic-sorted via range partitioning on
    (#CHROM, POS)); the driver then streams header + parts into the
    single output file — concatenation is sequential IO only, no
    parse/serialize. For folder-of-parts output at very large scale
    use write_table(fmt='tsv') + the header as a .hdr sidecar instead.
    """
    import glob
    import gzip
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    if "#CHROM" not in df.columns or "POS" not in df.columns:
        raise ValueError("VCF export needs #CHROM and POS columns")

    out = df
    # VCF missing-value convention
    out = out.select(*[
        F.coalesce(F.col(c).cast("string"), F.lit(".")).alias(c) for c in out.columns
    ])
    if sort:
        out = out.orderBy("#CHROM", F.col("POS").cast("long"))

    header = reconstruct_vcf_header(df, meta_lines, info_fields)

    tmp = tempfile.mkdtemp(prefix="vcf_export_")
    body_dir = os.path.join(tmp, "body")
    (out.write.mode("overwrite")
        .option("sep", "\t").option("header", "false")
        .option("emptyValue", ".").csv(body_dir))
    parts = sorted(glob.glob(os.path.join(body_dir, "part-*")))

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as fh:
        for line in header:
            fh.write(line + "\n")
        for p in parts:
            with open(p) as src:
                shutil.copyfileobj(src, fh)
    shutil.rmtree(tmp, ignore_errors=True)
