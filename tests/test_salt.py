"""salt() determinism + distribution (ADVICE round 1: the salt must be
a pure function of row content so checkpoint resume stays
byte-identical; it must also actually spread a hot key)."""

from pyspark.sql import functions as F

from howard_spark.encode import salt


def _mk(spark):
    # one hot key (90%) + a long tail
    rows = [("hot", f"p{i}", i) for i in range(900)] + [
        (f"repo{i}", f"p{i}", i) for i in range(100)
    ]
    return spark.createDataFrame(rows, "repo string, path string, v long")


def test_salt_deterministic_across_runs_and_partitionings(spark):
    df = _mk(spark)
    a = {(r["repo"], r["path"]): r["__salt"]
         for r in salt(df, "repo", 8).collect()}
    b = {(r["repo"], r["path"]): r["__salt"]
         for r in salt(df.repartition(7), "repo", 8).collect()}
    assert a == b  # pure function of row content, not of partitioning


def test_salt_spreads_hot_key(spark):
    df = _mk(spark)
    dist = (
        salt(df, "repo", 8)
        .where(F.col("repo") == "hot")
        .groupBy("__salt").count().collect()
    )
    buckets = {r["__salt"]: r["count"] for r in dist}
    assert len(buckets) == 8                    # every bucket used
    assert max(buckets.values()) < 900 * 0.35   # no bucket dominates


def test_salt_within_subset_of_columns(spark):
    df = _mk(spark)
    out = salt(df, "repo", 4, within=["path"])
    # same (repo, path) -> same salt regardless of other columns
    out2 = salt(df.withColumn("v", F.col("v") * 2), "repo", 4, within=["path"])
    a = {(r["repo"], r["path"]): r["__salt"] for r in out.collect()}
    b = {(r["repo"], r["path"]): r["__salt"] for r in out2.collect()}
    assert a == b


def test_salt_content_mode_cannot_spread_duplicates(spark):
    """Documented limitation: byte-identical rows land in ONE bucket."""
    df = spark.createDataFrame([("hot", "p", 1)] * 200,
                               "repo string, path string, v long")
    out = salt(df, "repo", 8).select("__salt").distinct().collect()
    assert len(out) == 1


def test_salt_spread_mode_spreads_duplicates(spark):
    df = spark.createDataFrame([("hot", "p", 1)] * 800,
                               "repo string, path string, v long")
    dist = (salt(df.repartition(8), "repo", 8, mode="spread")
            .groupBy("__salt").count().collect())
    buckets = {r["__salt"]: r["count"] for r in dist}
    assert len(buckets) >= 6            # duplicates DO spread
    assert max(buckets.values()) < 800 * 0.4
