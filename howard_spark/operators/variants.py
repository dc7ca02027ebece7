"""Variant-domain operators: the reference's core workload, Spark-first.

- ``annotate_equi``    = J1, the UPDATE…FROM parquet annotation join
  (/root/reference/howard/objects/variants.py:5845-6428) as a left
  join on (#CHROM, POS, REF, ALT) + INFO append. The reference's
  per-chromosome UPDATE loop (X1) disappears: partition pruning +
  AQE give the same effect declaratively.
- ``annotate_regions`` = J2, the interval join + string_agg
  (/root/reference/howard/objects/variants.py:6326-6348).
- ``prioritize``       = the profile-criteria engine
  (/root/reference/howard/objects/variants.py:7073-7815): N criteria
  become one select with a fold of when() expressions — one pass,
  no sequential UPDATEs.
- ``classify_variant`` = SNV/MNV/InDel classes (A4,
  /root/reference/howard/objects/variants.py:733-772).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.info import info_set

VARIANT_KEYS = ["#CHROM", "POS", "REF", "ALT"]


def annotate_equi(
    variants: DataFrame,
    ann: DataFrame,
    fields: list[str] | None = None,
    info_col: str = "INFO",
    broadcast_ann: bool | None = None,
) -> DataFrame:
    """Annotate variants from a variants-type database (J1).

    ``fields`` defaults to every non-key column of ``ann`` — the
    reference's full-INFO fast path (X8) falls out naturally because
    the whole row is joined once regardless of field count.
    Small annotation DBs are broadcast; big ones sort-merge on the
    composite key (Spark/AQE decides unless forced).
    """
    if fields is None:
        fields = [c for c in ann.columns if c not in VARIANT_KEYS and c != info_col]
    right = ann.select(*VARIANT_KEYS, *fields)
    if broadcast_ann:
        right = F.broadcast(right)
    # avoid name collisions on annotation columns
    renames = {f: f"__ann_{f}" for f in fields}
    for a, b in renames.items():
        right = right.withColumnRenamed(a, b)
    out = variants.join(right, VARIANT_KEYS, "left")
    new_info = F.col(info_col)
    for f_name, tmp in renames.items():
        new_info = F.when(
            F.col(tmp).isNotNull(), info_set(new_info, f_name, F.col(tmp))
        ).otherwise(new_info)
    return out.withColumn(info_col, new_info).drop(*renames.values())


def annotate_regions(
    variants: DataFrame,
    regions: DataFrame,
    fields: list[str] | None = None,
    info_col: str = "INFO",
) -> DataFrame:
    """Annotate from a regions-type (BED) database: interval join on
    POS ∈ [START+1, END] with REF-length awareness, then string_agg
    per variant (J2 + A6). The regions side is broadcast — BED tracks
    are small relative to the variant table at any scale; a
    non-broadcastable track would use a bucketized position prefix
    as an equi-key first."""
    if fields is None:
        fields = [c for c in regions.columns if c not in ("#CHROM", "START", "END")]
    r = F.broadcast(regions.select("#CHROM", "START", "END", *fields)
                    .withColumnRenamed("#CHROM", "__rchrom"))
    cond = (
        (F.col("#CHROM") == F.col("__rchrom"))
        & (F.col("POS") <= F.col("END"))
        & (F.col("POS") + F.length("REF") - 1 >= F.col("START") + 1)
    )
    joined = variants.join(r, cond, "left")
    aggs = [
        F.concat_ws(",", F.array_sort(F.collect_list(F.col(f).cast("string")))).alias(f"__agg_{f}")
        for f in fields
    ]
    per_variant = joined.groupBy(*[F.col(c) for c in variants.columns]).agg(*aggs)
    new_info = F.col(info_col)
    for f_name in fields:
        tmp = f"__agg_{f_name}"
        new_info = F.when(
            F.col(tmp) != "", info_set(new_info, f_name, F.col(tmp))
        ).otherwise(new_info)
    return per_variant.withColumn(info_col, new_info).drop(*[f"__agg_{f}" for f in fields])


@dataclass
class Criterion:
    """One prioritization criterion (profile JSON analog,
    /root/reference/howard/objects/variants.py:184-191,7676-7704)."""

    field: str
    op: str = "sql"          # gt|gte|lt|lte|eq|contains|sql
    value: object = None
    score: int = 0
    flag: str = "PASS"       # PASS | FILTERED
    comment: str = ""

    def condition(self) -> Column:
        c = F.col(self.field)
        if self.op == "sql":
            return F.expr(str(self.value))
        if self.op == "contains":
            return c.cast("string").rlike(f".*{self.value}.*")
        f = c.cast("float")
        return {
            "gt": f > self.value, "gte": f >= self.value,
            "lt": f < self.value, "lte": f <= self.value,
            "eq": f == self.value,
        }[self.op]


def prioritize(
    variants: DataFrame,
    criteria: list[Criterion],
    score_col: str = "PZScore",
    flag_col: str = "PZFlag",
    comment_col: str = "PZComment",
) -> DataFrame:
    """All criteria in ONE select: score = sum of matched criterion
    scores, flag = FILTERED if any criterion flags, comments joined.
    (The reference runs one UPDATE per criterion — sequential table
    rewrites; here Catalyst fuses the folds into one codegen stage.)"""
    if not criteria:
        return variants
    score = reduce(add, [F.when(c.condition(), F.lit(c.score)).otherwise(F.lit(0))
                         for c in criteria])
    filtered = reduce(
        lambda a, b: a | b,
        [c.condition() & F.lit(c.flag == "FILTERED") for c in criteria],
    )
    comments = F.concat_ws(
        "|",
        *[F.when(c.condition(), F.lit(c.comment)) for c in criteria if c.comment],
    )
    return (
        variants.withColumn(score_col, score)
        .withColumn(flag_col, F.when(filtered, "FILTERED").otherwise("PASS"))
        .withColumn(comment_col, comments)
    )


def classify_variant(ref: Column | str = "REF", alt: Column | str = "ALT") -> Column:
    """SNV / MNV / InDel / other classifier (A4)."""
    r = F.col(ref) if isinstance(ref, str) else ref
    a = F.col(alt) if isinstance(alt, str) else alt
    alpha = r.rlike("^[A-Za-z]+$") & a.rlike("^[A-Za-z]+$")
    return (
        F.when(~alpha, "other")
        .when((F.length(r) == 1) & (F.length(a) == 1), "SNV")
        .when(F.length(r) == F.length(a), "MNV")
        .otherwise("InDel")
    )


def best_transcript(
    transcripts: DataFrame,
    preference: DataFrame | None = None,
    order_cols: list[str] | None = None,
    key_cols: list[str] | None = None,
    preference_first: bool = True,
) -> DataFrame:
    """W1: best transcript per variant via row_number()=1, with the
    version-insensitive preference join (J6,
    /root/reference/howard/objects/variants.py:10447-10497).

    ``preference_first`` mirrors the reference's
    prioritization_transcripts_force switch (variants.py:10436-10438):
    True = the preference list overrides scores; False = scores rank
    first, preference breaks ties (the reference's default in
    transcripts_prioritization)."""
    from pyspark.sql.window import Window

    key_cols = key_cols or VARIANT_KEYS
    df = transcripts
    if preference is not None:
        pref = F.broadcast(
            preference.withColumn("__txbase", F.split("transcript", r"\.").getItem(0))
            .select("__txbase", F.col("rank").alias("__pref_rank"))
        )
        df = df.withColumn("__txbase", F.split("transcript", r"\.").getItem(0)).join(
            pref, "__txbase", "left"
        ).withColumn("__pref_rank", F.coalesce("__pref_rank", F.lit(10**9)))
    else:
        df = df.withColumn("__pref_rank", F.lit(10**9))
    scores = [F.desc(c) for c in (order_cols or [])]
    pref = [F.asc("__pref_rank")]
    order = (pref + scores if preference_first else scores + pref) + [F.asc("transcript")]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__pref_rank", "__txbase")
    )
