"""Local mirror of the driver's correctness gate.

For every registered query with an oracle: run the Spark DataFrame
program AND the DuckDB SQL on the same parquet tables, then compare
row count, column names, and order-insensitive values — the same
contract CORRECTNESS_r{N}.json is built from.
"""

from __future__ import annotations

import glob

import duckdb
import numpy as np
import pandas as pd
import pytest

from howard_spark.operators import load_all, load_extras

_DRIVER_Q, _DRIVER_O = load_all()
_EXTRA_Q, _EXTRA_O = load_extras()
# extras (demoted near-duplicate gates) keep full oracle parity here
# even though they are not exported through __spark_entry__
QUERIES = {**_DRIVER_Q, **_EXTRA_Q}
ORACLES = {**_DRIVER_O, **_EXTRA_O}


def test_driver_gate_count_within_window():
    """The driver verifies at most 50 gates per round (round 3: 7 of 57
    fell outside its window and got no CORRECTNESS row). Keep the
    driver-facing registry at <= 50 so EVERY gate is checked every
    round; new near-duplicates belong in EXTRA_QUERIES."""
    assert len(_DRIVER_Q) <= 50

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for f in glob.glob(f"{SF}/*.parquet"):
        name = f.split("/")[-1].removesuffix(".parquet")
        c.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    sdf = QUERIES[name](spark, SF).toPandas()
    odf = con.sql(ORACLES[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs {len(odf)}"
    a, b = normalize(sdf), normalize(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9, obj=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0  # runs and returns a stable relation
    assert len(df.columns) > 0


def test_mix_rebalance_rates_near_targets(spark):
    """q86's md5-threshold Bernoulli must land each stratum near its
    target rate (binomial tolerance at 100 docs/stratum) and be
    growth-stable: the sf0.001 keep-set is exactly the restriction of
    the sf0.01 keep-set to sf0.001's doc_ids."""
    from pyspark.sql import functions as F

    from howard_spark.operators.text import MIX_TARGETS, q86

    d = spark.read.parquet(f"{SF}/documents.parquet")
    per_lang = {r["lang"]: r["n"] for r in
                d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in
            q86(spark, SF).groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, p in MIX_TARGETS.items():
        if lang not in per_lang:
            continue
        rate = kept.get(lang, 0) / per_lang[lang]
        assert abs(rate - p) < 0.17, (lang, p, rate)

    # growth stability: grow the SAME corpus (original rows + new docs)
    # — every original doc's keep/drop decision must be unchanged
    import tempfile

    grown_dir = tempfile.mkdtemp(prefix="mix_grow_")
    extra = d.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                     "text", "lang", "source", "n_chars")
    d.unionByName(extra).write.mode("overwrite") \
        .parquet(f"{grown_dir}/documents.parquet")
    small = {r["doc_id"] for r in q86(spark, SF).collect()}
    grown = {r["doc_id"] for r in q86(spark, grown_dir).collect()}
    ids_small = {r["doc_id"] for r in d.select("doc_id").collect()}
    assert small == grown & ids_small  # originals' decisions unchanged
