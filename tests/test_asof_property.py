"""Property tests: asof_join vs pandas.merge_asof (all directions +
tolerance) and connected_components vs a union-find oracle, on
hypothesis-generated inputs.

Right timestamps are generated UNIQUE per key: on (key, ts) ties our
operator picks a deterministic hash-ordered winner while pandas picks
input order — both valid AS-OF semantics, so ties are excluded from
the cross-oracle comparison (tie determinism is covered separately in
test_asof.py)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from howard_spark.operators.dedup import connected_components
from howard_spark.operators.relational import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=50)


@st.composite
def asof_frames(draw):
    left = draw(st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12))
    right_kt = draw(st.sets(st.tuples(KEYS, TS), min_size=1, max_size=12))
    right = [(k, t, float(i)) for i, (k, t) in enumerate(sorted(right_kt))]
    return left, right


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(frames=asof_frames(),
       direction=st.sampled_from(["backward", "forward", "nearest"]),
       tolerance=st.sampled_from([None, 5]))
def test_asof_matches_pandas_merge_asof(spark, frames, direction, tolerance):
    left_rows, right_rows = frames
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "k int, ts long, lid int")
    right = spark.createDataFrame(right_rows, "k int, ts long, v double")
    got = asof_join(left, right, ["k"], "ts", right_cols=["v"],
                    direction=direction, tolerance=tolerance).collect()
    got_map = {r["lid"]: r["v_asof"] for r in got}

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left_rows)],
                      columns=["k", "ts", "lid"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction,
                        tolerance=tolerance)
    exp_map = {int(r.lid): (None if pd.isna(r.v) else float(r.v))
               for r in exp.itertuples()}
    assert got_map == exp_map


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    return {x: min(y for y in parent if find(y) == find(x))
            for x in parent}


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=40).filter(
        lambda es: any(u != v for u, v in es)))
def test_cc_matches_union_find(spark, edges):
    real = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(real, "u long, v long")
    got = {r["u"]: r["group_id"]
           for r in connected_components(df).collect()}
    assert got == _uf_components(real)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(rows=st.lists(
    st.tuples(st.integers(-1000, 100_000), st.integers(0, 500)),
    min_size=1, max_size=30, unique_by=lambda r: r[0]),
    capacity=st.sampled_from([1, 64, 4096]),
    n_buckets=st.sampled_from([1, 3, 64]))
def test_pack_bins_matches_serial_prefix_sum(spark, rows, capacity,
                                             n_buckets):
    from howard_spark.operators.text import pack_bins

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {r["doc_id"]: r["bin_id"]
           for r in pack_bins(df, capacity=capacity,
                              n_buckets=n_buckets).collect()}
    cum = 0
    exp = {}
    for doc_id, n in sorted(rows):
        exp[doc_id] = cum // capacity
        cum += n
    assert got == exp
