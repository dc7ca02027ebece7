"""'extann' gene-annotation file -> BED-like database (+ .hdr sidecar).

The reference's second database-build tool
(/root/reference/howard/functions/from_extann.py:1-391) turns a
gene-keyed TSV (a ``genes`` symbol column + annotation columns) into a
BED-like annotation database by matching gene coordinates in a refgene
table, with one of three transcript-selection modes. Spark-first
re-expression:

- refgene spans: per (gene, transcript) the reference takes the first
  row's (#CHROM, START) and the last row's END of the position-sorted
  exon rows (from_extann.py:190-232); order-free Spark equivalent is
  min(START) / max(END) per group
- mode 'all'     : one output row per transcript       (:214-232)
- mode 'longest' : the transcript maximizing END-START per gene, ties
  to the smallest transcript id (pandas dict-max keeps the first
  sorted key, :190-211)
- mode 'chosen'  : per-gene transcript from a user table; falls back
  to 'longest' when the gene or transcript is absent (:234-265)
- output: #CHROM START END [extra refgene cols] [all extann cols],
  NULLs as '.', optional value-replacement map, sorted genomically
  (the reference shells out to ``sort -k1,1V -k2,2n``, :377-380);
  header = ##fileformat/##INFO-per-column/##reference meta + column
  line, written into the file AND a .hdr sidecar (:133-178, :16-78)

The joins are Spark-native: refgene spans are a groupBy, gene matching
is an equi-join (refgene is small -> broadcast), transcript selection
a window top-1 — no per-gene pandas loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MANDATORY = ["#CHROM", "START", "END"]


def _read_tsv(spark: SparkSession, path: str) -> DataFrame:
    return (spark.read.option("sep", "\t").option("header", "true")
            .option("nullValue", ".").csv(path))


def _spans(refgene: DataFrame, extra_cols: list[str]) -> DataFrame:
    """Per (gene, transcript) genomic span from refgene exon rows."""
    for c in ("name", "transcript", "#CHROM", "START", "END"):
        if c not in refgene.columns:
            raise ValueError(f"refgene is missing column {c!r}")
    # #CHROM is part of the group key: a (gene, transcript) that appears
    # on two chromosomes (PAR genes on chrX/chrY) must yield one span per
    # chromosome, never a min/max straddling both. Extra columns come
    # from the position-sorted first row (min_by on (START, END)) — the
    # reference takes the first row of the sorted group; plain first()
    # in an unordered groupBy would be nondeterministic.
    start = F.col("START").cast("long")
    pos_key = F.struct(start.alias("s"), F.col("END").cast("long").alias("e"))
    return refgene.groupBy("name", "transcript", "#CHROM").agg(
        F.min(start).alias("START"),
        F.max(F.col("END").cast("long")).alias("END"),
        *[F.min_by(c, pos_key).alias(c) for c in extra_cols],
    )


def read_extann(
    spark: SparkSession,
    extann_path: str,
    refgene_path: str,
    mode: str = "all",
    transcripts: DataFrame | None = None,
    extra_cols: list[str] | None = None,
    replace: dict | None = None,
) -> DataFrame:
    """Gene-keyed annotation TSV -> BED-like DataFrame (see module
    docstring). ``transcripts`` (columns gene, transcript) is required
    semantics-wise only for mode='chosen' rows that name one."""
    extra_cols = extra_cols or []
    extann = _read_tsv(spark, extann_path)
    if "genes" not in extann.columns:
        raise ValueError("extann file needs a 'genes' column")
    refgene = _read_tsv(spark, refgene_path)
    spans = _spans(refgene, extra_cols)

    if mode == "all":
        pick = spans
    elif mode in ("longest", "chosen"):
        w = Window.partitionBy("name").orderBy(
            F.desc(F.col("END") - F.col("START")), F.asc("transcript"))
        longest = (spans.withColumn("__rn", F.row_number().over(w))
                   .where(F.col("__rn") == 1).drop("__rn"))
        if mode == "longest":
            pick = longest
        else:
            if transcripts is None:
                raise ValueError("mode='chosen' needs a transcripts table")
            chosen = (spans.join(
                F.broadcast(transcripts.select(
                    F.col("gene").alias("name"),
                    F.col("transcript").alias("__want"))),
                "name")
                .where(F.col("transcript") == F.col("__want"))
                .drop("__want"))
            # fall back to longest for genes whose chosen transcript
            # (or any entry) is absent
            fallback = longest.join(
                chosen.select("name").distinct(), "name", "left_anti")
            pick = chosen.unionByName(fallback)
    else:
        raise ValueError(f"unknown extann mode {mode!r}")

    out = extann.join(
        F.broadcast(pick.withColumnRenamed("name", "genes")), "genes")
    ann_cols = [c for c in extann.columns]

    def _val(c):
        s = F.col(c).cast("string")
        for k, v in (replace or {}).items():
            # literal (non-regex) replacement, like the reference's
            # str.replace value map
            s = F.replace(s, F.lit(str(k)), F.lit(str(v)))
        return F.coalesce(s, F.lit("."))

    return out.select(
        "#CHROM", "START", "END",
        *[F.coalesce(F.col(c).cast("string"), F.lit(".")).alias(c)
          for c in extra_cols],
        *[_val(c).alias(c) for c in ann_cols],
    )


def extann_header(
    df: DataFrame,
    info_meta: dict | None = None,
    reference: str = "hg19",
) -> list[str]:
    """##fileformat + ##INFO per annotation column (+##reference), the
    reference's metaheader (from_extann.py:16-91); unknown columns get
    the default Number=1,Type=String,Description='.'."""
    lines = ["##fileformat=VCFv4.4"]
    for c in df.columns:
        if c in MANDATORY:
            continue
        meta = (info_meta or {}).get(c, {})
        num = meta.get("Number", "1")
        typ = meta.get("Type", "String")
        desc = meta.get("Description", ".")
        lines.append(
            f'##INFO=<ID={c},Number={num},Type={typ},Description="{desc}">')
    lines.append(f"##reference={reference}")
    return lines


def extann_to_bed(
    spark: SparkSession,
    extann_path: str,
    refgene_path: str,
    output_path: str,
    mode: str = "all",
    transcripts: DataFrame | None = None,
    extra_cols: list[str] | None = None,
    replace: dict | None = None,
    info_meta: dict | None = None,
) -> DataFrame:
    """Full build: extann TSV + refgene -> genomically-sorted BED-like
    file with embedded header + '.hdr' sidecar (gz via BGZF when the
    path ends in .gz — the reference shells out to bgzip)."""
    import glob
    import os
    import shutil
    import tempfile

    from .writers import BgzfWriter, genomic_chrom_key

    df = read_extann(spark, extann_path, refgene_path, mode=mode,
                     transcripts=transcripts, extra_cols=extra_cols,
                     replace=replace)
    header = extann_header(df, info_meta)
    rank, core = genomic_chrom_key(F.col("#CHROM"))
    body = df.orderBy(rank, core, F.col("START").cast("long"))

    tmp = tempfile.mkdtemp(prefix="extann_")
    (body.write.mode("overwrite")
     .option("sep", "\t").option("header", "false")
     .option("emptyValue", ".").option("quote", "\u0000")
     .csv(os.path.join(tmp, "body")))
    parts = sorted(glob.glob(os.path.join(tmp, "body", "part-*")))

    head_txt = "\n".join(header) + "\n" + "\t".join(df.columns) + "\n"
    with open(output_path + ".hdr", "w") as fh:
        fh.write(head_txt)
    if output_path.endswith(".gz"):
        with BgzfWriter(output_path) as fh:
            fh.write(head_txt)
            for p in parts:
                with open(p) as src:
                    for chunk in iter(lambda s=src: s.read(1 << 16), ""):
                        fh.write(chunk)
    else:
        with open(output_path, "w") as fh:
            fh.write(head_txt)
            for p in parts:
                with open(p) as src:
                    shutil.copyfileobj(src, fh)
    shutil.rmtree(tmp, ignore_errors=True)
    return df
