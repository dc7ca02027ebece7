"""Genotype functions (SURVEY.md §2.10 F1-F6), as NATIVE expressions.

The reference implements these as pandas ``.apply(axis=1)`` row
functions (/root/reference/howard/functions/commons.py:1009-1374,
applied at /root/reference/howard/objects/variants.py:9153-9401) — the
per-row-Python anti-pattern. Here each one is a single Catalyst
expression over the packed ``FORMAT`` / per-sample columns, so they run
in the JVM inside whole-stage codegen at any scale.

Packed layout (VCF): FORMAT = "GT:DP:AD", sample = "0/1:30:10,20".
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

MISSING_GT = ("./.", ".", "./|", ".|.")


def format_field(sample: Column | str, fmt: Column | str, key: str) -> Column:
    """Extract one FORMAT key's value from a packed sample column —
    position of ``key`` in FORMAT indexes the sample split."""
    s = F.col(sample) if isinstance(sample, str) else sample
    f = F.col(fmt) if isinstance(fmt, str) else fmt
    pos = F.array_position(F.split(f, ":"), key)  # 1-based, 0 = absent
    return F.when(pos > 0, F.get(F.split(s, ":"), pos.cast("int") - 1))


def gt_of(sample, fmt) -> Column:
    return format_field(sample, fmt, "GT")


def _has_variant(gt: Column) -> Column:
    """A sample carries the variant if GT has an allele > 0."""
    return gt.isNotNull() & gt.rlike("[1-9]")


def findbypipeline(fmt: str, samples: list[str]) -> Column:
    """F1: '<n_with_variant>/<n_samples>'
    (/root/reference/howard/functions/commons.py:1009-1051)."""
    n = reduce(add, [
        F.when(_has_variant(gt_of(s, fmt)), 1).otherwise(0) for s in samples
    ])
    return F.concat_ws("/", n.cast("string"), F.lit(str(len(samples))))


def genotype_concordance(fmt: str, samples: list[str]) -> Column:
    """F2: TRUE iff every sample carrying data has the same GT
    (/root/reference/howard/functions/commons.py:1054-1098)."""
    gts = F.array_distinct(F.array(*[
        F.coalesce(gt_of(s, fmt), F.lit("./.")) for s in samples
    ]))
    informative = F.array_remove(gts, "./.")
    return F.size(informative) <= 1


def _gt_code(gt: Column) -> Column:
    """Barcode digit per sample: 0 = hom-ref, 1 = het, 2 = hom-alt/multi,
    '?' handled by caller (null GT)."""
    alts = F.size(F.filter(F.split(gt, "[/|]"), lambda a: (a != "0") & (a != ".")))
    tot = F.size(F.split(gt, "[/|]"))
    return (
        F.when(gt.isNull() | gt.isin(*MISSING_GT), "?")
        .when(alts == 0, "0")
        .when(alts < tot, "1")
        .otherwise("2")
    )


def barcode(fmt: str, samples: list[str]) -> Column:
    """F3: per-sample genotype barcode string, e.g. '012'
    (/root/reference/howard/functions/commons.py:1101-1187)."""
    return F.concat(*[_gt_code(gt_of(s, fmt)) for s in samples])


def trio_inheritance(fmt: str, father: str, mother: str, child: str) -> Column:
    """F4: denovo / dominant / recessive from the trio barcode
    (/root/reference/howard/functions/commons.py:1190-1222)."""
    bc = barcode(fmt, [father, mother, child])
    return (
        F.when(bc.rlike("^00[12]$"), "denovo")
        .when(bc.rlike("^[12]{3}$") | bc.rlike("^[12][12]2$"), "recessive")
        .when(bc.rlike("[12]"), "dominant")
        .otherwise("unknown")
    )


def vaf_from_ad(fmt: str, sample: str) -> Column:
    """F5 (core case): VAF = alt_depth / total_depth from the AD field
    (/root/reference/howard/functions/commons.py:1225-1295)."""
    ad = F.split(format_field(sample, fmt, "AD"), ",")
    # try_cast: missing AD is '.' in VCF — must yield NULL, not a cast error
    depths = F.transform(ad, lambda x: x.try_cast("double"))
    total = F.aggregate(depths, F.lit(0.0), lambda acc, x: acc + F.coalesce(x, F.lit(0.0)))
    alt = F.aggregate(
        F.slice(depths, 2, 100), F.lit(0.0), lambda acc, x: acc + F.coalesce(x, F.lit(0.0))
    )
    return F.when(total > 0, F.round(alt / total, 6))


def genotype_stats(fmt: str, samples: list[str], key: str = "DP") -> dict[str, Column]:
    """F6: per-row min/max/mean of a numeric FORMAT field across samples
    (/root/reference/howard/functions/commons.py:1298-1374)."""
    vals = F.filter(
        F.array(*[format_field(s, fmt, key).try_cast("double") for s in samples]),
        lambda x: x.isNotNull(),
    )
    n = F.size(vals)
    total = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
    return {
        f"{key}_n": n,
        f"{key}_min": F.array_min(vals),
        f"{key}_max": F.array_max(vals),
        f"{key}_mean": F.when(n > 0, F.round(total / n, 6)),
    }
