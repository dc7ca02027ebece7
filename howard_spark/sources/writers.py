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
