"""Calculation dispatch registry — the reference's named-calculation
surface (/root/reference/config/calculations_config.json, dispatch at
/root/reference/howard/objects/variants.py:8365-8531, exercised by
ref tests/test_variants_calculations.py).

Every calculation is a DataFrame -> DataFrame transform built from
native expressions (the reference runs pandas .apply(axis=1) row
functions + sequential UPDATEs; here each is one Catalyst select).
Results land in the packed INFO column via info_set, matching the
reference's INFO-append protocol.

Default snpEff ANN header (16 fields) per the snpEff VCF spec.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .genotypes import (
    barcode,
    findbypipeline,
    genotype_concordance,
    genotype_stats,
    trio_inheritance,
    vaf_from_ad,
)
from .info import info_get, info_set

SNPEFF_ANN_HEADER = [
    "Allele", "Annotation", "AnnotationImpact", "GeneName", "GeneID",
    "FeatureType", "FeatureID", "TranscriptBioType", "Rank", "HGVSc",
    "HGVSp", "cDNApos", "CDSpos", "AApos", "Distance", "ERRORS",
]


def _set_info(df: DataFrame, tag: str, value, info_col: str = "INFO") -> DataFrame:
    cond = value.isNotNull() & (value.cast("string") != "") & (value.cast("string") != ".")
    return df.withColumn(
        info_col,
        F.when(cond, info_set(F.col(info_col), tag, value)).otherwise(F.col(info_col)),
    )


# --- sql-type calculations -------------------------------------------------


def calc_variant_chr_pos_alt_ref(df: DataFrame, **kw) -> DataFrame:
    value = F.concat_ws("_", F.col("#CHROM"), F.col("POS"), F.col("REF"), F.col("ALT"))
    return _set_info(df, kw.get("tag", "variant_chr_pos_alt_ref"), value)


def calc_vartype(df: DataFrame, **kw) -> DataFrame:
    """VARTYPE incl. SVTYPE passthrough and MOSAIC (ref config VARTYPE)."""
    svtype = F.nullif(info_get("INFO", "SVTYPE"), F.lit(""))
    r, a = F.col("REF"), F.col("ALT")
    value = (
        F.when(svtype.isNotNull(), svtype)
        .when((F.length(r) == 1) & (F.length(a) == 1), "SNV")
        .when(r.contains(",") | a.contains(","), "MOSAIC")
        .when((F.length(r) == F.length(a)) & (F.length(r) > 1), "MNV")
        .when(F.length(r) != F.length(a), "INDEL")
        .otherwise("UNDEFINED")
    )
    return _set_info(df, kw.get("tag", "VARTYPE"), value)


def calc_variant_id(df: DataFrame, **kw) -> DataFrame:
    value = F.md5(F.concat_ws("_", F.col("#CHROM"), F.col("POS"), F.col("REF"), F.col("ALT")))
    return _set_info(df, kw.get("tag", "variant_id"), value)


# --- snpEff ANN calculations -------------------------------------------------


def _ann_entries(info_col: str, ann_field: str):
    return F.split(F.nullif(info_get(info_col, ann_field), F.lit("")), ",")


def calc_snpeff_hgvs(df: DataFrame, ann_field: str = "ANN",
                     header: list[str] | None = None, **kw) -> DataFrame:
    """HGVS names from snpEff ANN: per entry join non-empty
    [GeneID, FeatureID, exon<Rank>, HGVS.c, HGVS.p] with ':'
    (ref extract_snpeff_hgvs, commons.py:806-875)."""
    header = header or SNPEFF_ANN_HEADER
    idx = {name: i for i, name in enumerate(header)}

    def one(e):
        p = F.split(e, r"\|")

        def fld(name):
            return F.coalesce(p.getItem(idx[name]), F.lit(""))

        rank = fld("Rank")
        parts = F.array(
            fld("GeneID"),
            fld("FeatureID"),
            F.when(rank != "", F.concat(F.lit("exon"), F.split_part(rank, F.lit("/"), F.lit(1)))).otherwise(""),
            fld("HGVSc"),
            fld("HGVSp"),
        )
        return F.array_join(F.filter(parts, lambda x: x != ""), ":")

    value = F.array_join(F.transform(_ann_entries("INFO", ann_field), one), ",")
    return _set_info(df, kw.get("tag", "snpeff_hgvs"), F.nullif(value, F.lit("")))


def calc_snpeff_ann_explode(df: DataFrame, ann_field: str = "ANN",
                            header: list[str] | None = None,
                            uniquify: bool = False,
                            output_format: str = "fields",
                            prefix: str = "ANN_", **kw) -> DataFrame:
    """Explode snpEff ANN into per-field aggregate columns
    (ref explode_snpeff_ann, commons.py:879-1006): for each ANN field,
    a column 'ANN_<field>' with the ','-joined (optionally uniquified)
    values across entries; output_format='json' packs one JSON column."""
    header = header or SNPEFF_ANN_HEADER
    entries = _ann_entries("INFO", ann_field)
    def _extract(i):
        # NOTE: must stay a 1-arg lambda — a 2-arg lambda would make
        # F.transform pass (element, index) and shadow the field index
        return lambda e: F.coalesce(F.split(e, r"\|").getItem(i), F.lit(""))

    per_field = {}
    for i, name in enumerate(header):
        vals = F.transform(entries, _extract(i))
        if uniquify:
            vals = F.array_distinct(vals)
        per_field[prefix + name] = F.array_join(vals, ",")
    if output_format == "json":
        out_col = kw.get("tag", prefix.rstrip("_").lower() + "_json")
        return df.withColumn(
            out_col,
            F.when(entries.isNotNull(),
                   F.to_json(F.struct(*[v.alias(k) for k, v in per_field.items()]))),
        )
    out = df
    for name, col in per_field.items():
        out = out.withColumn(name, F.when(entries.isNotNull(), F.nullif(col, F.lit(""))))
    return out


# --- genotype calculations ---------------------------------------------------


def calc_findbypipeline(df: DataFrame, samples: list[str],
                        fmt: str = "FORMAT", **kw) -> DataFrame:
    return _set_info(df, kw.get("tag", "findbypipeline"), findbypipeline(fmt, samples))


def calc_findbysample(df: DataFrame, samples: list[str],
                      fmt: str = "FORMAT", **kw) -> DataFrame:
    """FINDBYSAMPLE: same count as FINDBYPIPELINE under a sample-named
    tag (ref config: both dispatch calculation_find_by_pipeline)."""
    return _set_info(df, kw.get("tag", "findbysample"), findbypipeline(fmt, samples))


def calc_genotype_concordance(df: DataFrame, samples: list[str],
                              fmt: str = "FORMAT", **kw) -> DataFrame:
    value = F.when(genotype_concordance(fmt, samples), "TRUE").otherwise("FALSE")
    return _set_info(df, kw.get("tag", "genotypeconcordance"), value)


def calc_barcode(df: DataFrame, samples: list[str],
                 fmt: str = "FORMAT", **kw) -> DataFrame:
    return _set_info(df, kw.get("tag", "barcode"), barcode(fmt, samples))


def calc_barcode_family(df: DataFrame, samples: list[str],
                        family_pedigree: dict | list | None = None,
                        fmt: str = "FORMAT", tag: str = "BCF", **kw) -> DataFrame:
    """BARCODEFAMILY (ref calculation_barcode_family,
    variants.py:9412-9555): barcode restricted to the pedigree samples,
    appended as FORMAT fields <tag> (barcode) and <tag>S (sample list)
    on every pedigree sample column."""
    if isinstance(family_pedigree, dict):
        ped_samples = list(family_pedigree.values())
    elif isinstance(family_pedigree, (list, tuple)):
        ped_samples = list(family_pedigree)
    elif isinstance(family_pedigree, str):
        ped_samples = family_pedigree.split(",")
    else:
        ped_samples = list(samples)
    bc = barcode(fmt, ped_samples)
    sample_list = F.lit(",".join(ped_samples))
    out = df.withColumn(fmt, F.concat_ws(":", F.col(fmt), F.lit(tag), F.lit(f"{tag}S")))
    for s in samples:
        if s in ped_samples:
            out = out.withColumn(s, F.concat_ws(":", F.col(s), bc, sample_list))
        else:
            out = out.withColumn(s, F.concat_ws(":", F.col(s), F.lit("."), F.lit(".")))
    return out


def calc_trio(df: DataFrame, samples: list[str],
              family_pedigree: dict | None = None,
              fmt: str = "FORMAT", **kw) -> DataFrame:
    ped = family_pedigree or {}
    father = ped.get("father", samples[0])
    mother = ped.get("mother", samples[1] if len(samples) > 1 else samples[0])
    child = ped.get("child", samples[2] if len(samples) > 2 else samples[-1])
    return _set_info(df, kw.get("tag", "trio"), trio_inheritance(fmt, father, mother, child))


def calc_vaf_normalization(df: DataFrame, samples: list[str],
                           fmt: str = "FORMAT", **kw) -> DataFrame:
    """VAF per sample appended to FORMAT (core AD case)."""
    out = df.withColumn(fmt, F.concat_ws(":", F.col(fmt), F.lit("VAF")))
    for s in samples:
        out = out.withColumn(
            s, F.concat_ws(":", F.col(s), F.coalesce(vaf_from_ad(fmt, s).cast("string"), F.lit(".")))
        )
    return out


def _calc_stats(key: str):
    def fn(df: DataFrame, samples: list[str], fmt: str = "FORMAT", **kw) -> DataFrame:
        stats = genotype_stats(fmt, samples, key=key)
        out = df
        for name, col in stats.items():
            out = _set_info(out, kw.get("prefix", "") + name, col)
        return out

    return fn


calc_vaf_stats = _calc_stats("VAF")
calc_dp_stats = _calc_stats("DP")


def calc_nomen(df: DataFrame, hgvs_field: str = "hgvs", **kw) -> DataFrame:
    """NOMEN extraction from an HGVS INFO field (ref
    calculation_extract_nomen; repo operators/nomen.py)."""
    from ..operators.nomen import find_nomen_df

    tmp = "__nomen_src"
    out = df.withColumn(tmp, F.nullif(info_get("INFO", hgvs_field), F.lit("")))
    return find_nomen_df(out, hgvs_col=tmp, **kw).drop(tmp)


# --- registry ----------------------------------------------------------------

CALCULATIONS: dict[str, Callable[..., DataFrame]] = {
    "variant_chr_pos_alt_ref": calc_variant_chr_pos_alt_ref,
    "VARTYPE": calc_vartype,
    "snpeff_hgvs": calc_snpeff_hgvs,
    "snpeff_ann_explode": calc_snpeff_ann_explode,
    "snpeff_ann_explode_uniquify": lambda df, **kw: calc_snpeff_ann_explode(df, uniquify=True, **kw),
    "snpeff_ann_explode_json": lambda df, **kw: calc_snpeff_ann_explode(df, output_format="json", **kw),
    "NOMEN": calc_nomen,
    "FINDBYPIPELINE": calc_findbypipeline,
    "FINDBYSAMPLE": calc_findbysample,
    "GENOTYPECONCORDANCE": calc_genotype_concordance,
    "BARCODE": calc_barcode,
    "BARCODEFAMILY": calc_barcode_family,
    "TRIO": calc_trio,
    "VAF": calc_vaf_normalization,
    "VAF_stats": calc_vaf_stats,
    "DP_stats": calc_dp_stats,
    "variant_id": calc_variant_id,
}


def apply_calculation(df: DataFrame, name: str, **kw) -> DataFrame:
    """Dispatch one named calculation (the reference's
    `calculation(operation)` entry point, variants.py:8365)."""
    try:
        fn = CALCULATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown calculation {name!r}; available: {sorted(CALCULATIONS)}"
        ) from None
    return fn(df, **kw)
