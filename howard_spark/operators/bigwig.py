"""BigWig per-variant signal lookup (F10, reference annotation
'bigwig' at /root/reference/howard/objects/variants.py:3576-3620:
``bw_db.values(CHROM, POS-1, POS)`` per variant, INFO set when the
value is not NaN).

Spark-first shape: ONE mapInPandas kernel; each task opens a single
BigWig handle for its partition lifetime (the per-executor-handle
pattern — BigWig files are indexed, random access is cheap, and the
file is on shared storage at scale) and fetches positions in batch.

The real backend needs ``pyBigWig`` (absent in this container — the
import is try-gated exactly like the media codecs in multimodal.py).
The kernel plumbing is backend-injectable: tests exercise partition
handle lifecycle, batch fetch, NaN handling and INFO update through a
deterministic fake backend.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.info import info_set

# backend factory: path -> (chrom: str, pos_1based: int) -> float (NaN = absent)
BackendFactory = Callable[[str], Callable[[str, int], float]]


def pybigwig_backend(path: str):
    """Real backend: one pyBigWig handle per task (lazy import)."""
    try:
        import pyBigWig  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "pyBigWig is not installed; pass a custom backend_factory "
            "(see tests/test_bigwig.py for the injectable protocol)"
        ) from e
    bw = pyBigWig.open(path)

    def fetch(chrom: str, pos: int) -> float:
        vals = bw.values(chrom, pos - 1, pos)
        return vals[0] if vals else float("nan")

    return fetch


def annotate_bigwig(
    variants: DataFrame,
    bw_path: str,
    field: str,
    info_col: str = "INFO",
    chrom_col: str = "#CHROM",
    pos_col: str = "POS",
    backend_factory: BackendFactory = pybigwig_backend,
    round_digits: int = 6,
) -> DataFrame:
    """Append ``field=<signal>`` to INFO for every variant whose BigWig
    value at POS is defined (non-NaN)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    tmp = f"__bw_{field}"
    out_schema = StructType(list(variants.schema.fields) + [StructField(tmp, DoubleType())])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = None  # one handle per task, opened on first batch
        for pdf in batches:
            if fetch is None:
                fetch = backend_factory(bw_path)
            vals = [
                fetch(str(c), int(p))
                for c, p in zip(pdf[chrom_col], pdf[pos_col])
            ]
            pdf[tmp] = [None if (v is None or math.isnan(v)) else v for v in vals]
            yield pdf

    annotated = variants.mapInPandas(kernel, out_schema)
    value = F.round(F.col(tmp), round_digits)
    return annotated.withColumn(
        info_col,
        F.when(F.col(tmp).isNotNull(), info_set(F.col(info_col), field, value))
        .otherwise(F.col(info_col)),
    ).drop(tmp)
