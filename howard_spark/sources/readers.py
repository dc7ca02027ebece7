"""Readers for the reference's input formats (SURVEY.md §2.1 S1-S7).

vcf[.gz] / tsv / csv / psv / tbl / bed / json / parquet (file or
hive-partitioned folder), mirroring ``Database.get_sql_from``
(/root/reference/howard/objects/database.py:1267-1418) on Spark's
native scans — partition discovery, predicate pushdown and column
pruning come free from the Parquet/CSV sources.

Schema authority: an optional JSON sidecar ``<file>.schema.json``
(Spark StructType json) plays the role of the reference's ``.hdr``
VCF-header sidecar (/root/reference/howard/objects/variants.py:427-430).
"""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_DELIMS = {"csv": ",", "tsv": "\t", "psv": "|", "tbl": "|", "bed": "\t"}

VCF_CORE_COLS = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]


def infer_format(path: str) -> str:
    p = path[:-3] if path.endswith(".gz") else path
    ext = os.path.splitext(p)[1].lstrip(".").lower()
    if ext in ("parquet", "pq"):
        return "parquet"
    if ext in ("vcf",):
        return "vcf"
    if ext in _DELIMS or ext == "json":
        return ext
    if os.path.isdir(path):
        return "parquet"  # hive-partitioned folder
    raise ValueError(f"cannot infer format of {path}")


def _sidecar_schema(path: str) -> StructType | None:
    sc = path + ".schema.json"
    if os.path.isfile(sc):
        with open(sc) as fh:
            return StructType.fromJson(json.load(fh))
    return None


def read_table(spark: SparkSession, path: str, fmt: str | None = None,
               schema: StructType | None = None, header: bool = True) -> DataFrame:
    fmt = fmt or infer_format(path)
    schema = schema or _sidecar_schema(path)
    if fmt == "parquet":
        # files and hive-partitioned folders alike (S1)
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "vcf":
        return read_vcf(spark, path)
    if fmt in _DELIMS:
        r = (
            spark.read.option("sep", _DELIMS[fmt])
            .option("header", str(header and fmt != "bed").lower())
            .option("inferSchema", "false" if schema else "true")
        )
        if schema:
            r = r.schema(schema)
        df = r.csv(path)
        if fmt == "bed":
            # BED is always read header=false (option above), so the
            # positional rename must be unconditional — otherwise
            # Engine.annotation sees _c0/_c1/_c2 and mis-routes .bed
            # databases to annotate_equi (needs #CHROM/START/END).
            base = ["#CHROM", "START", "END"]
            names = base + [f"c{i}" for i in range(len(df.columns) - 3)]
            df = df.toDF(*names[: len(df.columns)])
        return df
    raise ValueError(f"unsupported format {fmt}")


def _vcf_header_lines(path: str) -> tuple[list[str], list[str]]:
    """(## meta lines, column names) — peeks the file head locally."""
    opener = gzip.open if path.endswith(".gz") else open
    meta, cols = [], []
    with opener(path, "rt") as fh:
        for line in fh:
            if line.startswith("##"):
                meta.append(line.rstrip("\n"))
            elif line.startswith("#"):
                cols = line.rstrip("\n").split("\t")
                break
            else:
                break
    return meta, cols


def read_vcf(spark: SparkSession, path: str) -> DataFrame:
    """Header-aware VCF scan (S3): '##' meta skipped, '#CHROM' line
    names the columns, POS typed int, QUAL double. Distributed text
    scan; only the header peek is driver-side."""
    meta, cols = _vcf_header_lines(path)
    if not cols:
        cols = VCF_CORE_COLS
    txt = spark.read.text(path)
    rows = txt.where(~F.col("value").startswith("#"))
    parts = F.split("value", "\t")
    sel = []
    for i, c in enumerate(cols):
        col = parts.getItem(i)
        if c == "POS":
            col = col.cast("int")
        elif c == "QUAL":
            col = F.when(parts.getItem(i) == ".", None).otherwise(
                parts.getItem(i)
            ).cast("double")
        sel.append(col.alias(c))
    return rows.select(sel)


def parse_vcf_info_fields(path: str) -> list[dict]:
    """INFO field declarations from the ## header (ID/Number/Type),
    the schema-authority role of the reference's pyvcf parse
    (/root/reference/howard/objects/variants.py:478)."""
    meta, _ = _vcf_header_lines(path)
    out = []
    for line in meta:
        if line.startswith("##INFO=<"):
            body = line[len("##INFO=<"):].rstrip(">")
            kv = {}
            for part in body.split(","):
                if "=" in part:
                    k, _, v = part.partition("=")
                    kv[k] = v.strip('"')
            out.append(kv)
    return out
