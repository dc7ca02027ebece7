"""large-star/small-star connected components: O(log n) rounds, so a
long chain (diameter >> 64) that round-2's min-label propagation would
refuse converges in a handful of rounds."""

import pytest

from howard_spark.operators.dedup import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "u long, v long")
    return {r["u"]: r["group_id"]
            for r in connected_components(df, **kw).collect()}


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-200: diameter 200 > the old 64-round bound
    n = 200
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert len(got) == n + 1
    assert set(got.values()) == {0}


def test_two_components_and_self_loops(spark):
    edges = [(5, 3), (3, 9), (20, 21), (7, 7)]  # self-loop dropped
    got = _cc(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_star_and_duplicate_edges(spark):
    edges = [(1, 2), (2, 1), (1, 3), (1, 4), (4, 1)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_round_bound_raises(spark):
    with pytest.raises(RuntimeError, match="converge"):
        _cc(spark, [(i, i + 1) for i in range(64)], max_rounds=1)


def test_durable_checkpoint_mode(spark, tmp_path):
    import os

    edges = [(i, i + 1) for i in range(80)] + [(200, 201)]
    df = spark.createDataFrame(edges, "u long, v long")
    ck = str(tmp_path / "cc_ckpt")
    got = {r["u"]: r["group_id"]
           for r in connected_components(df, checkpoint_dir=ck).collect()}
    assert set(got.values()) == {0, 200}
    assert os.listdir(ck)  # durable round state actually written
