"""Packed ``k=v;k=v`` INFO-string algebra, as native Spark expressions.

The reference's single most-used idiom: INFO fields are decoded with
``REGEXP_EXTRACT(concat(';', INFO), ';field=([^;]*)', 1)`` and deleted
with ``REGEXP_REPLACE(INFO, ';*field=[^;]*', '')``
(/root/reference/howard/objects/variants.py:1912-1918, 6145-6153,
6220). Here the same algebra is column expressions Catalyst can fold,
prune, and pipeline — no in-place UPDATE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def info_get(info: Column | str, field: str) -> Column:
    """Extract one field's value from a packed INFO string ('' if absent)."""
    c = F.col(info) if isinstance(info, str) else info
    return F.regexp_extract(F.concat(F.lit(";"), c), f";{field}=([^;]*)", 1)


def info_has(info: Column | str, field: str) -> Column:
    c = F.col(info) if isinstance(info, str) else info
    return F.concat(F.lit(";"), c, F.lit(";")).rlike(f";{field}(=[^;]*)?;")


def info_drop(info: Column | str, field: str) -> Column:
    """Remove a field (and its leading separator) from a packed INFO."""
    c = F.col(info) if isinstance(info, str) else info
    cleaned = F.regexp_replace(c, f"(^|;){field}=[^;]*", "")
    return F.regexp_replace(cleaned, "^;", "")


def info_set(info: Column | str, field: str, value: Column) -> Column:
    """Upsert ``field=value`` into a packed INFO (append protocol of
    /root/reference/howard/objects/variants.py:6364-6387)."""
    c = F.col(info) if isinstance(info, str) else info
    base = info_drop(c, field)
    kv = F.concat(F.lit(f"{field}="), value.cast("string"))
    return F.when(
        (base == "") | base.isNull(), kv
    ).otherwise(F.concat(base, F.lit(";"), kv))


def explode_info(df: DataFrame, info_col: str, fields: list[str],
                 prefix: str = "INFO/") -> DataFrame:
    """Packed INFO -> typed physical columns (the reference's
    'explode_infos', /root/reference/howard/objects/variants.py:1771-1986).
    One select, N regexp_extracts — a single codegen stage."""
    out = df
    for f in fields:
        out = out.withColumn(prefix + f, F.nullif(info_get(info_col, f), F.lit("")))
    return out


def pack_info(df: DataFrame, fields: list[str], prefix: str = "INFO/",
              out_col: str = "INFO") -> DataFrame:
    """Typed columns -> packed INFO string (inverse of explode_info)."""
    parts = [
        F.when(
            F.col(prefix + f).isNotNull(),
            F.concat(F.lit(f + "="), F.col(prefix + f).cast("string")),
        )
        for f in fields
    ]
    return df.withColumn(out_col, F.concat_ws(";", *parts))
