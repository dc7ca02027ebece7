"""ANNOVAR text table -> variants parquet database (+ .hdr sidecar).

The reference's database-build tooling
(/root/reference/howard/functions/from_annovar.py:208-1091) turns an
ANNOVAR generic tab-separated annotation table into its
parquet+header database format through a temp-VCF + DuckDB pipeline.
Spark-first re-expression of the same semantics, no temp VCF:

- header detection / synonym normalization (Chr/Start/Ref/Alt ->
  #CHROM/POS/REF/ALT; headerless files get positional names with a
  ``database_name`` prefix)  — ref from_annovar.py:289-383
- identifier sanitization ('-'->'_', '+' removed, '.'->'_')
  — ref from_annovar.py:389-395
- per-column type probing ('.' = missing; a column whose non-null
  values all parse numeric becomes BIGINT/DOUBLE) in ONE distributed
  aggregate pass instead of a 1M-row pandas sample
  — ref from_annovar.py:425-431 + :524-531
- ANNOVAR '-' indel convention -> left-anchored VCF alleles
  (POS-1 and an 'N' anchor base)  — ref from_annovar.py:752-762
- chromosome fixing: 'chr' prefix, MT->M, 23->X, 24->Y
  — ref from_annovar.py:622-634
- INFO assembly: 'col=value;' for non-null values, ';' in values ->
  ','; multi-annotation variants group on the variant key and
  aggregate distinct values comma-joined (multi_variant auto mode)
  — ref from_annovar.py:745-786
- output: parquet (#CHROM POS ID REF ALT QUAL FILTER INFO) + a VCF
  '.hdr' sidecar declaring every annotation as an INFO tag
  — ref from_annovar.py:680-703

The body scan, type probe, normalization and INFO assembly are all
distributed (one csv scan + one aggregate + optionally one groupBy on
the variant key); only the header sniff reads the file head on the
driver (bounded: first non-comment line).
"""

from __future__ import annotations

import gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VARIANT_KEYS = ["#CHROM", "POS", "REF", "ALT"]
_CHROM_SYNONYMS = ["#CHROM", "CHROM", "Chr", "chr", "CHR", "Chromosome"]
_POS_SYNONYMS = ["POS", "Pos", "pos", "Start", "START"]
_REF_SYNONYMS = ["REF", "Ref", "ref"]
_ALT_SYNONYMS = ["ALT", "Alt", "alt"]


def _sanitize(name: str) -> str:
    out = name.replace("-", "_").replace("+", "").replace(".", "_")
    if out and out[0].isdigit():
        out = "A" + out
    return out


def _open_text(path: str):
    return gzip.open(path, "rt") if path.endswith(".gz") else open(path)


def sniff_annovar_header(
    path: str, database_name: str | None = None
) -> tuple[list[str], int]:
    """Driver-side header sniff (bounded read): returns (column names,
    number of leading comment/header lines). Headerless files get
    positional names: #CHROM POS ID REF ALT then '{prefix}', then
    '{prefix}_2', ... (ref from_annovar.py:355-383)."""
    skip = 0
    first_data: str | None = None
    header_line: str | None = None
    with _open_text(path) as fh:
        for line in fh:
            if line.startswith("##"):
                skip += 1
                continue
            if line.startswith("#"):
                header_line = line.rstrip("\n")
                skip += 1
                continue
            first_data = line.rstrip("\n")
            break
    if first_data is None and header_line is None:
        raise ValueError(f"empty annovar file: {path}")

    prefix = database_name or "column"
    if header_line is not None:
        cols = header_line.lstrip("#").rstrip().split("\t")
        # synonym normalization, first match wins per slot
        for target, syns in (
            ("#CHROM", _CHROM_SYNONYMS), ("POS", _POS_SYNONYMS),
            ("REF", _REF_SYNONYMS), ("ALT", _ALT_SYNONYMS),
        ):
            if target in cols:
                continue
            for s in syns:
                if s in cols:
                    cols[cols.index(s)] = target
                    break
        if "#CHROM" not in cols:
            cols[0] = "#CHROM"
        if "POS" not in cols:
            cols[1] = "POS"
        if "REF" not in cols and len(cols) > 3:
            cols[3] = "REF"
        if "ALT" not in cols and len(cols) > 4:
            cols[4] = "ALT"
    else:
        n = len(first_data.split("\t"))
        if n < 5:
            raise ValueError("annovar file needs >= 5 columns when headerless")
        cols = ["#CHROM", "POS", "ID", "REF", "ALT"]
        for i in range(5, n):
            cols.append(prefix if i == 5 else f"{prefix}_{i - 4}")
    out, seen = [], set()
    for c in cols:
        c = _sanitize(c) if c not in VARIANT_KEYS + ["ID"] else c
        base, k = c, 2
        while c in seen:
            c = f"{base}_{k}"
            k += 1
        seen.add(c)
        out.append(c)
    return out, skip


def _probe_types(raw: DataFrame, ann_cols: list[str]) -> dict[str, str]:
    """One aggregate pass over the table: a column whose non-null
    values all try_cast numeric is BIGINT (all integral) or DOUBLE;
    otherwise STRING. Distributed equivalent of the reference's pandas
    to_numeric probe (from_annovar.py:524-531)."""
    if not ann_cols:
        return {}
    aggs = []
    for c in ann_cols:
        q = f"`{c}`"
        aggs.append(F.every(
            F.col(c).isNull() | F.expr(f"try_cast({q} AS DOUBLE) IS NOT NULL")
        ).alias(f"num_{c}"))
        aggs.append(F.every(
            F.col(c).isNull() | F.expr(f"try_cast({q} AS BIGINT) IS NOT NULL")
        ).alias(f"int_{c}"))
        aggs.append(F.max(F.col(c).isNotNull()).alias(f"any_{c}"))
    row = raw.agg(*aggs).first()
    types = {}
    for c in ann_cols:
        if not row[f"any_{c}"]:
            types[c] = "string"
        elif row[f"int_{c}"]:
            types[c] = "bigint"
        elif row[f"num_{c}"]:
            types[c] = "double"
        else:
            types[c] = "string"
    return types


def _fix_chrom(col):
    """'chr' prefix + MT->M, 23->X, 24->Y (ref from_annovar.py:622-634)."""
    with_prefix = F.when(col.startswith("chr"), col).otherwise(
        F.concat(F.lit("chr"), col))
    return (
        F.when(with_prefix == "chrMT", F.lit("chrM"))
        .when(with_prefix == "chr23", F.lit("chrX"))
        .when(with_prefix == "chr24", F.lit("chrY"))
        .otherwise(with_prefix)
    )


def read_annovar(
    spark: SparkSession,
    path: str,
    database_name: str | None = None,
    multi_variant: str | bool = "auto",
) -> tuple[DataFrame, list[dict]]:
    """Parse an ANNOVAR text table into a typed variants DataFrame
    (#CHROM POS ID REF ALT QUAL FILTER INFO) plus the INFO field
    declarations for the .hdr sidecar. See module docstring for the
    reference parity map."""
    cols, _skip = sniff_annovar_header(path, database_name)
    raw = (
        spark.read.option("sep", "\t").option("header", "false")
        .option("comment", "#").option("nullValue", ".")
        .csv(path)
    )
    if len(raw.columns) != len(cols):
        raise ValueError(
            f"column count mismatch: header says {len(cols)}, "
            f"data has {len(raw.columns)}")
    raw = raw.toDF(*cols)

    ann_cols = [c for c in cols if c not in VARIANT_KEYS + ["ID"]]
    types = _probe_types(raw, ann_cols)

    # ANNOVAR '-' indel convention -> left-anchored VCF alleles
    ref_missing = F.col("REF").isNull() | (F.col("REF") == "-")
    alt_missing = F.col("ALT").isNull() | (F.col("ALT") == "-")
    ref0 = F.coalesce(F.col("REF"), F.lit(""))
    alt0 = F.coalesce(F.col("ALT"), F.lit(""))
    norm = raw.select(
        _fix_chrom(F.col("#CHROM").cast("string")).alias("#CHROM"),
        F.when(ref_missing | alt_missing,
               F.col("POS").cast("bigint") - 1)
        .otherwise(F.col("POS").cast("bigint")).alias("POS"),
        (F.col("ID").cast("string") if "ID" in cols
         else F.lit(None).cast("string")).alias("ID"),
        F.when(ref_missing, F.lit("N"))
        .when(alt_missing, F.concat(F.lit("N"), ref0))
        .otherwise(F.col("REF")).alias("REF"),
        F.when(ref_missing, F.concat(F.lit("N"), alt0))
        .when(alt_missing, F.lit("N"))
        .otherwise(F.col("ALT")).alias("ALT"),
        *[F.col(c).cast(types[c]).alias(c) for c in ann_cols],
    )

    if multi_variant == "auto" or multi_variant is None:
        top = (norm.groupBy(*VARIANT_KEYS).count()
               .agg(F.max("count").alias("m")).first()["m"]) or 0
        multi = top > 1
    else:
        multi = (multi_variant is True
                 or str(multi_variant).lower().startswith("enable"))

    def _val(c):
        s = F.col(c).cast("string")
        return F.regexp_replace(s, ";", ",")

    if multi:
        # distinct values per variant, sorted for determinism,
        # comma-joined (ref STRING_AGG(DISTINCT ...), ';'->',')
        aggs = [
            F.array_join(
                F.array_sort(F.array_distinct(
                    F.collect_list(_val(c)))), ","
            ).alias(c)
            for c in ann_cols
        ]
        base = norm.groupBy(*VARIANT_KEYS).agg(*aggs)
        vals = {c: F.when(F.col(c) == "", None).otherwise(F.col(c))
                for c in ann_cols}
    else:
        base = norm
        vals = {c: _val(c) for c in ann_cols}

    # concat_ws skips NULL operands: exactly the reference's
    # skip-missing + strip-trailing-';' INFO assembly
    info = F.concat_ws(";", *[
        F.when(vals[c].isNotNull(), F.concat(F.lit(f"{c}="), vals[c]))
        for c in ann_cols
    ])
    # main-column constants match the reference database format exactly
    # (ref from_annovar.py:732-746: '' AS ID, '' AS QUAL, 'PASS' AS FILTER)
    # so parquet dbs built here are drop-in for reference-built ones.
    out = base.select(
        "#CHROM", "POS",
        F.lit("").alias("ID"),
        "REF", "ALT",
        F.lit("").alias("QUAL"),
        F.lit("PASS").alias("FILTER"),
        F.when(info == "", None).otherwise(info).alias("INFO"),
    )

    _vcf_type = {"bigint": "Integer", "double": "Float", "string": "String"}
    info_fields = [
        {"ID": c, "Number": ".", "Type": _vcf_type[types[c]],
         "Description": f"{c} annotation"}
        for c in ann_cols
    ]
    return out, info_fields


def annovar_to_parquet(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    database_name: str | None = None,
    multi_variant: str | bool = "auto",
    partition_by: list[str] | None = None,
) -> list[dict]:
    """Full database build: ANNOVAR text -> parquet + '.hdr' VCF-header
    sidecar (the reference's database format contract). Returns the
    INFO declarations written to the sidecar."""
    from .writers import reconstruct_vcf_header

    df, info_fields = read_annovar(
        spark, input_path, database_name=database_name,
        multi_variant=multi_variant)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(output_path)
    header = reconstruct_vcf_header(df, None, info_fields)
    with open(output_path + ".hdr", "w") as fh:
        fh.write("\n".join(header) + "\n")
    return info_fields
