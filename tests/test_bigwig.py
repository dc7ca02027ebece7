"""BigWig lookup plumbing (F10) through a deterministic fake backend —
the real pyBigWig path is import-gated (absent in this container)."""

import math

import pytest

from howard_spark.operators.bigwig import annotate_bigwig, pybigwig_backend

SCHEMA = "`#CHROM` string, POS int, REF string, ALT string, INFO string"
ROWS = [
    ("chr1", 100, "A", "T", "DP=10"),
    ("chr1", 250, "C", "G", ""),
    ("chr2", 100, "G", "A", "DP=5"),   # NaN region on chr2 -> untouched
]

def _make_fake_backend():
    # defined inside a function so cloudpickle ships it by VALUE --
    # executors cannot import the tests module
    def fake_backend(path):
        """Deterministic signal: chr1 -> pos/1000; chr2 -> NaN."""
        def fetch(chrom, pos):
            return pos / 1000.0 if chrom == "chr1" else float("nan")

        return fetch

    return fake_backend


def _info(row, tag):
    for part in (row["INFO"] or "").split(";"):
        k, _, v = part.partition("=")
        if k == tag:
            return v
    return None


def test_annotate_bigwig_fake(spark):
    fake_backend = _make_fake_backend()
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = annotate_bigwig(df, "/fake/track.bw", "phyloP",
                          backend_factory=fake_backend).collect()
    r = {(row["#CHROM"], row["POS"]): row for row in out}
    assert _info(r[("chr1", 100)], "phyloP") == "0.1"
    assert _info(r[("chr1", 100)], "DP") == "10"      # existing INFO kept
    assert _info(r[("chr1", 250)], "phyloP") == "0.25"
    assert _info(r[("chr2", 100)], "phyloP") is None  # NaN -> untouched
    assert r[("chr2", 100)]["INFO"] == "DP=5"


def test_multi_partition(spark):
    fake_backend = _make_fake_backend()
    df = spark.createDataFrame(ROWS * 20, SCHEMA).repartition(4)
    # one handle per task: the kernel must survive multiple partitions
    assert annotate_bigwig(df, "/fake/track.bw", "sig",
                           backend_factory=fake_backend).count() == 60


def test_real_backend_requires_pybigwig():
    with pytest.raises(ImportError, match="pyBigWig"):
        pybigwig_backend("/fake/track.bw")
