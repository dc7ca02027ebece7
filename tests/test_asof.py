"""asof_join unit semantics (beyond the q70 DuckDB gate).

Round-2 advice regressions:
- a genuine NULL inside the newest matching right row must survive
  (not back-fill a stale value from an older right row): the right
  payload travels as ONE atomic struct.
- right rows tied on (key, ts) must produce a deterministic winner
  across runs and input partitionings (full-row xxhash64 tiebreak).
"""

from pyspark.sql import functions as F

from howard_spark.operators.relational import asof_join


def _left(spark, rows):
    return spark.createDataFrame(rows, "user_id int, ts long, event_id string")


def _right(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, ts long, event_id string, value double")


def test_asof_null_in_newest_right_row_survives(spark):
    left = _left(spark, [(1, 100, "click")])
    # newest match (ts=90) has value=NULL; an older row (ts=50) has 5.0.
    right = _right(spark, [(1, 50, "old", 5.0), (1, 90, "new", None)])
    out = asof_join(left, right, ["user_id"], "ts",
                    right_cols=["event_id", "value"]).collect()
    assert len(out) == 1
    r = out[0]
    # both payload columns from the SAME (newest) right row:
    assert r["event_id_asof"] == "new"
    assert r["value_asof"] is None  # NOT back-filled with 5.0


def test_asof_no_prior_right_row_gives_nulls(spark):
    left = _left(spark, [(1, 10, "early"), (2, 100, "nomatch")])
    right = _right(spark, [(1, 50, "late", 1.0)])
    out = {r["event_id"]: r for r in asof_join(
        left, right, ["user_id"], "ts",
        right_cols=["event_id", "value"]).collect()}
    assert out["early"]["event_id_asof"] is None
    assert out["nomatch"]["value_asof"] is None


def test_asof_inclusive_equal_ts(spark):
    left = _left(spark, [(1, 100, "click")])
    right = _right(spark, [(1, 100, "same_ts", 2.0)])
    out = asof_join(left, right, ["user_id"], "ts",
                    right_cols=["event_id", "value"]).collect()
    assert out[0]["event_id_asof"] == "same_ts"


def test_asof_tied_right_rows_deterministic(spark):
    left = _left(spark, [(1, 100, "click")])
    # three DISTINCT right rows with identical (key, ts)
    tied = [(1, 90, f"r{i}", float(i)) for i in range(3)]
    right = _right(spark, tied)
    picks = set()
    for nparts in (1, 2, 5):
        out = asof_join(left, right.repartition(nparts), ["user_id"], "ts",
                        right_cols=["event_id", "value"]).collect()
        r = out[0]
        # no mixing: value matches the picked event_id's own row
        assert r["value_asof"] == float(r["event_id_asof"][1:])
        picks.add(r["event_id_asof"])
    assert len(picks) == 1  # stable winner across partitionings


def test_asof_multi_key_and_suffix(spark):
    left = spark.createDataFrame(
        [("a", 1, 100, "L")], "k1 string, k2 int, ts long, tag string")
    right = spark.createDataFrame(
        [("a", 1, 99, 7.0), ("a", 2, 99, 8.0)],
        "k1 string, k2 int, ts long, value double")
    out = asof_join(left, right, ["k1", "k2"], "ts",
                    right_cols=["value"], suffix="_m").collect()
    assert out[0]["value_m"] == 7.0


def test_asof_forward(spark):
    left = _left(spark, [(1, 100, "click")])
    right = _right(spark, [(1, 90, "before", 1.0), (1, 150, "after", 2.0),
                           (1, 300, "later", 3.0)])
    out = asof_join(left, right, ["user_id"], "ts",
                    right_cols=["event_id", "value"],
                    direction="forward").collect()
    assert out[0]["event_id_asof"] == "after"


def test_asof_forward_inclusive(spark):
    left = _left(spark, [(1, 100, "click")])
    right = _right(spark, [(1, 100, "same", 1.0)])
    out = asof_join(left, right, ["user_id"], "ts",
                    right_cols=["event_id"], direction="forward").collect()
    assert out[0]["event_id_asof"] == "same"


def test_asof_nearest_and_tie_to_backward(spark):
    left = _left(spark, [(1, 100, "a"), (1, 200, "b"), (1, 310, "c")])
    right = _right(spark, [(1, 90, "r90", 1.0), (1, 205, "r205", 2.0),
                           (1, 300, "r300", 3.0), (1, 320, "r320", 4.0)])
    got = {r["event_id"]: r["event_id_asof"] for r in asof_join(
        left, right, ["user_id"], "ts", right_cols=["event_id"],
        direction="nearest").collect()}
    assert got["a"] == "r90"     # |100-90|=10 < |205-100|
    assert got["b"] == "r205"    # forward closer (5 < 110)
    assert got["c"] == "r300"    # exact tie (10 vs 10) -> backward


def test_asof_tolerance(spark):
    left = _left(spark, [(1, 100, "near"), (1, 500, "far")])
    right = _right(spark, [(1, 95, "r95", 1.0)])
    got = {r["event_id"]: r for r in asof_join(
        left, right, ["user_id"], "ts", right_cols=["event_id", "value"],
        tolerance=10).collect()}
    assert got["near"]["event_id_asof"] == "r95"
    assert got["far"]["event_id_asof"] is None  # 405 > tolerance


def test_asof_nearest_on_timestamp_column(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", "L")],
        "user_id int, ts string, tag string").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:01:30", 2.0)],
        "user_id int, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    out = asof_join(left, right, ["user_id"], "ts", right_cols=["v"],
                    direction="nearest").collect()
    assert out[0]["v_asof"] == 2.0  # 30s forward beats 60s backward
    out2 = asof_join(left, right, ["user_id"], "ts", right_cols=["v"],
                     direction="nearest", tolerance=10).collect()
    assert out2[0]["v_asof"] is None  # both beyond 10s


def test_asof_date_ts_nearest_and_tolerance(spark):
    """DateType ts with direction='nearest' + tolerance: Spark has no
    date->double cast, so _num must route via timestamp (ADVICE r3)."""
    import datetime as dt

    left = spark.createDataFrame(
        [(1, dt.date(2024, 3, 10), "ev")],
        "user_id int, ts date, event_id string")
    right = spark.createDataFrame(
        [(1, dt.date(2024, 3, 8), 8.0), (1, dt.date(2024, 3, 11), 11.0)],
        "user_id int, ts date, value double")
    out = asof_join(left, right, ["user_id"], "ts",
                    right_cols=["value"], direction="nearest").collect()
    assert len(out) == 1 and out[0]["value_asof"] == 11.0  # 1 day < 2 days

    # tolerance is in seconds for date-typed ts (epoch-second numeric
    # domain): half a day excludes both neighbours
    out2 = asof_join(left, right, ["user_id"], "ts",
                     right_cols=["value"], direction="nearest",
                     tolerance=43200).collect()
    assert len(out2) == 1 and out2[0]["value_asof"] is None
