"""HGVS NOMEN extraction (SURVEY.md §2.10 F7), fully native.

Re-expresses the reference's ``find_nomen``
(/root/reference/howard/functions/commons.py:510-711) — a per-row
Python loop over comma-separated HGVS candidates — as Catalyst array
expressions: explode candidates, classify the ':'-separated parts with
``filter``/regex, score with sizes + a broadcast preference-rank map,
and keep the first maximal candidate per row with a window.

Scoring parity with the reference:
- every part occurrence scores (+1 per transcript/cnomen/... part,
  +2 extra per NM_, +1 extra per NR_);
- a transcript found in the preference list adds
  100 * (len(list) - rank + 1), once per matching transcript part;
- within a category the LAST part wins the field value;
- among equal scores the FIRST candidate wins (strict > replacement).
Deviation (documented): the per-row ``transcript`` column source and
``transcripts_source_order`` machinery is not implemented — the
preference list is the file-list path, the common case.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_PATTERN = "GNOMEN:TNOMEN:ENOMEN:CNOMEN:RNOMEN:NNOMEN:PNOMEN"

_CATEGORIES = {
    "TVNOMEN": r"^[NX][MR]_",
    "TPVNOMEN": r"^[NX]P_",
    "CNOMEN": r"^(c|g|m)\.",
    "NNOMEN": r"^n\.",
    "RNOMEN": r"^r\.",
    "PNOMEN": r"^p\.",
    "ENOMEN": r"^exon",
}


def find_nomen_df(
    df: DataFrame,
    hgvs_col: str = "hgvs",
    key: list[str] | None = None,
    transcripts: list[str] | None = None,
    pattern: str = DEFAULT_PATTERN,
) -> DataFrame:
    """Append NOMEN component columns, choosing the best-scored HGVS
    candidate per row. ``key`` must uniquely identify rows."""
    key = key or ["#CHROM", "POS", "REF", "ALT"]
    transcripts = transcripts or []
    tlen = len(transcripts)

    cand = df.select(
        *key, F.col(hgvs_col),
        F.posexplode_outer(F.split(F.col(hgvs_col), ",")).alias("__pos", "__cand"),
    )
    parts = F.split(F.col("__cand"), ":")

    def _matcher(rex: str):
        return lambda x: x.rlike(rex)

    sel: dict[str, Column] = {}
    for name, rex in _CATEGORIES.items():
        matched = F.filter(parts, _matcher(rex))
        sel[name] = F.try_element_at(matched, F.lit(-1))  # last occurrence wins
        sel[f"__n_{name}"] = F.size(matched)

    other = F.filter(
        parts,
        lambda x: ~reduce(lambda a, b: a | b, [x.rlike(r) for r in _CATEGORIES.values()]),
    )
    sel["GNOMEN"] = F.try_element_at(other, F.lit(-1))

    sel["TNOMEN"] = F.split(sel["TVNOMEN"], r"\.").getItem(0)
    sel["VNOMEN"] = F.try_element_at(F.split(sel["TVNOMEN"], r"\."), F.lit(2))
    sel["TPNOMEN"] = F.split(sel["TPVNOMEN"], r"\.").getItem(0)

    # occurrence-weighted base score
    tv_parts = F.filter(parts, lambda x: x.rlike(_CATEGORIES["TVNOMEN"]))
    score = reduce(add, [
        F.coalesce(F.col(f"s.__n_{n}"), F.lit(0))
        for n in _CATEGORIES
    ])
    score = score + 2 * F.size(F.filter(tv_parts, lambda x: x.rlike("^NM_"))) \
        + F.size(F.filter(tv_parts, lambda x: x.rlike("^NR_")))

    # preference bonus: 100 * (len - rank + 1) per matching transcript part
    if transcripts:
        kv = []
        for rank, t in enumerate(transcripts, start=1):
            kv += [F.lit(t), F.lit(rank)]
        tmap = F.create_map(*kv)
        bonus_of = lambda x: F.coalesce(
            tmap[x], tmap[F.split(x, r"\.").getItem(0)]
        )
        bonus = F.aggregate(
            tv_parts, F.lit(0),
            lambda acc, x: acc + F.coalesce(
                (F.lit(tlen) - bonus_of(x) + 1) * 100, F.lit(0)
            ),
        )
        score = score + bonus

    enriched = cand.select(*key, hgvs_col, "__pos", "__cand",
                           F.struct(*[v.alias(k) for k, v in sel.items()
                                      if not k.startswith("__n_")],
                                    *[v.alias(k) for k, v in sel.items()
                                      if k.startswith("__n_")]).alias("s"))
    enriched = enriched.withColumn("__score", score)

    w = Window.partitionBy(*key).orderBy(F.desc("__score"), F.asc("__pos"))
    best = (
        enriched.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )

    nomen_fields = [f for f in pattern.split(":")]
    nomen = F.concat_ws(":", *[F.col(f"s.{f}") for f in nomen_fields])
    out_cols = ["NOMEN"] + [c for c in
                            ("GNOMEN", "TNOMEN", "TVNOMEN", "VNOMEN", "TPNOMEN",
                             "TPVNOMEN", "CNOMEN", "NNOMEN", "RNOMEN", "PNOMEN",
                             "ENOMEN")]
    result = best.select(
        *key, F.col(hgvs_col),
        nomen.alias("NOMEN"),
        *[F.col(f"s.{c}").alias(c) for c in out_cols[1:]],
    )
    return df.join(result.drop(hgvs_col), key, "left")
