"""Engine facade: the reference's `Variants` workflow, Spark-first.

Mirrors the user-visible lifecycle of
/root/reference/howard/objects/variants.py (load_data -> annotation ->
calculation -> prioritization -> query -> export, §3 of SURVEY.md) as a
thin object over a SparkSession. Where the reference mutates one DuckDB
table in place (ALTER/UPDATE), this accumulates lazy DataFrame
transformations and executes once at export/collect — Catalyst sees the
whole pipeline (§2.9: the UPDATE idiom disappears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .functions.info import explode_info, info_get
from .operators.variants import (
    Criterion,
    annotate_equi,
    annotate_regions,
    best_transcript,
    classify_variant,
    prioritize,
)
from .sources import read_table, write_table

TABLE_NAME = "variants"  # the reference's single table abstraction


class Engine:
    def __init__(self, spark: SparkSession, input_path: str | None = None,
                 fmt: str | None = None, df: DataFrame | None = None):
        self.spark = spark
        if df is None and input_path is not None:
            df = read_table(spark, input_path, fmt=fmt)
        if df is None:
            raise ValueError("provide input_path or df")
        self.df = df
        self._register()

    # -- lifecycle ---------------------------------------------------------
    def _register(self):
        self.df.createOrReplaceTempView(TABLE_NAME)

    def query(self, sql: str) -> DataFrame:
        """Ad-hoc SQL over the registered view (the `howard query` tool,
        /root/reference/howard/tools/query.py:72-97)."""
        self._register()
        return self.spark.sql(sql)

    def annotation(self, db: DataFrame | str, fields: list[str] | None = None,
                   regions: bool = False) -> "Engine":
        """Annotate from a variants-type or regions-type database
        (routes like /root/reference/howard/objects/variants.py:2888)."""
        ann = db if isinstance(db, DataFrame) else read_table(self.spark, db)
        if regions or {"START", "END"} <= set(ann.columns):
            self.df = annotate_regions(self.df, ann, fields=fields)
        else:
            self.df = annotate_equi(self.df, ann, fields=fields)
        self._register()
        return self

    def calculation(self, name: str, **kw) -> "Engine":
        """Dispatch a named calculation from the registry (the
        `howard calculation` tool; ref variants.py:8365-8531 +
        config/calculations_config.json). See
        functions/calculations.CALCULATIONS for the 17 operations."""
        from .functions.calculations import apply_calculation

        self.df = apply_calculation(self.df, name, **kw)
        self._register()
        return self

    def calculation_variant_class(self, out_field: str = "VARTYPE") -> "Engine":
        from pyspark.sql import functions as F

        from .functions.info import info_set

        self.df = self.df.withColumn(
            "INFO", info_set("INFO", out_field, classify_variant())
        )
        self._register()
        return self

    def explode_infos(self, fields: list[str], prefix: str = "INFO/") -> "Engine":
        self.df = explode_info(self.df, "INFO", fields, prefix=prefix)
        self._register()
        return self

    def prioritization(self, criteria: list[Criterion]) -> "Engine":
        self.df = prioritize(self.df, criteria)
        self._register()
        return self

    def transcripts_best(self, preference: DataFrame | None = None,
                         order_cols: list[str] | None = None) -> DataFrame:
        return best_transcript(self.df, preference=preference, order_cols=order_cols)

    def stats(self) -> dict:
        """The `howard stats` tool's headline numbers
        (/root/reference/howard/objects/variants.py:600-783) in one pass."""
        from pyspark.sql import functions as F

        cls = classify_variant()
        row = self.df.agg(
            F.count("*").alias("n"),
            F.countDistinct("#CHROM").alias("n_chrom"),
            F.sum(F.when(cls == "SNV", 1).otherwise(0)).alias("n_snv"),
            F.sum(F.when(cls == "InDel", 1).otherwise(0)).alias("n_indel"),
            F.sum(F.when(cls == "MNV", 1).otherwise(0)).alias("n_mnv"),
        ).first()
        per_chrom = {
            r["#CHROM"]: r["cnt"]
            for r in self.df.groupBy("#CHROM").agg(F.count("*").alias("cnt")).collect()
        }
        return {**row.asDict(), "per_chrom": per_chrom}

    VCF_REQUIRED = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL",
                    "FILTER", "INFO"]

    def minimalize(self, info: bool = False, id: bool = False,
                   qual: bool = False, filter: bool = False,
                   samples: bool = False, remove_samples: bool = False,
                   explode_infos_fields: list[str] | None = None) -> "Engine":
        """The reference's `minimalize` plugin
        (/root/reference/plugins/minimalize/__main__.py:78-116, loader
        functions/plugins.py:1-124): blank out INFO/ID/FILTER to '.'
        and QUAL to NULL, reduce samples to their GT field (FORMAT
        becomes 'GT', each sample column keeps only its first
        ':'-token), or drop sample columns entirely. Optionally explode
        INFO fields into typed columns FIRST (so a parquet/TSV database
        keeps the tags it is about to blank from the packed string).

        Where the reference runs one UPDATE per field against its
        DuckDB table, this is a single select — Catalyst folds all the
        blanking into the scan projection."""
        from pyspark.sql import functions as F

        if explode_infos_fields:
            self.explode_infos(explode_infos_fields)
        df = self.df
        if remove_samples:
            keep = [c for c in df.columns
                    if c in self.VCF_REQUIRED or c.startswith("INFO/")]
            df = df.select(*keep)
        elif samples:
            sample_cols = [c for c in df.columns
                           if c not in self.VCF_REQUIRED
                           and not c.startswith("INFO/") and c != "FORMAT"]
            if "FORMAT" in df.columns:
                df = df.withColumn("FORMAT", F.lit("GT"))
            for c in sample_cols:
                df = df.withColumn(
                    c, F.split(F.col(c).cast("string"), ":").getItem(0))
        blank = {"INFO": info, "ID": id, "FILTER": filter}
        for col, on in blank.items():
            if on and col in df.columns:
                df = df.withColumn(col, F.lit("."))
        if qual and "QUAL" in df.columns:
            df = df.withColumn(
                "QUAL", F.lit(None).cast(df.schema["QUAL"].dataType))
        self.df = df
        self._register()
        return self

    def export(self, path: str, fmt: str | None = None,
               order_by: list[str] | None = None, **kw) -> "Engine":
        write_table(self.df, path, fmt=fmt, order_by=order_by, **kw)
        return self

    def process(self, param: dict) -> DataFrame | None:
        """The `howard process` tool: one param dict drives the whole
        annotate -> calculate -> prioritize -> query -> export pipeline
        (/root/reference/howard/tools/process.py:26-99; param JSON shape
        simplified Spark-first). Recognized keys:

        - ``annotations``: list of db paths, or dicts
          {"path": ..., "fields": [...], "regions": bool}
        - ``calculations``: list of names, or dicts
          {"name": ..., **kwargs}
        - ``prioritizations``: list of Criterion dicts
        - ``query``: SQL over the `variants` view, run AFTER the steps
        - ``output``: {"path": ..., "fmt": ..., "order_by": [...]}

        Returns the query result DataFrame when ``query`` is given,
        else None; the engine's df carries all applied steps either way.
        """
        for ann in param.get("annotations", []):
            if isinstance(ann, str):
                self.annotation(ann)
            else:
                self.annotation(ann["path"], fields=ann.get("fields"),
                                regions=bool(ann.get("regions")))
        for calc in param.get("calculations", []):
            if isinstance(calc, str):
                self.calculation(calc)
            else:
                kw = {k: v for k, v in calc.items() if k != "name"}
                self.calculation(calc["name"], **kw)
        crits = param.get("prioritizations", [])
        if crits:
            self.prioritization([Criterion(**c) for c in crits])
        out = None
        if param.get("query"):
            out = self.query(param["query"])
        sink = param.get("output")
        if sink:
            df = out if out is not None else self.df
            write_table(df, sink["path"], fmt=sink.get("fmt"),
                        order_by=sink.get("order_by"))
        return out

    # -- encoded storage layer ----------------------------------------------
    def encode(self, out_dir: str, keys: list[str] | None = None, **kw) -> dict:
        """Persist through the lightweight-codec storage layer (the
        graft's replacement for the reference's Parquet/DuckDB files)."""
        from .checkpoint import encode_to_dir

        keys = keys or [c for c in ("#CHROM", "POS", "repo", "path") if c in self.df.columns]
        return encode_to_dir(self.df, out_dir, keys=keys, **kw)

    @classmethod
    def from_encoded(cls, spark: SparkSession, enc_dir: str, schema) -> "Engine":
        from .checkpoint import read_encoded
        from .encode import decode_df

        return cls(spark, df=decode_df(read_encoded(spark, enc_dir), schema))
