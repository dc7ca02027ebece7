"""Sized LSH band families (embedding_neardup_lsh): wider bands cut
candidate volume ~N^2/2^bits-style while holding near-dup recall, and
extra bands buy the remainder back — the 100-TB sizing lever the fixed
4-bit gate config (q44) doesn't exercise. Deterministic planted
near-dups (seeded), so the exact counts are stable."""

import numpy as np
import pytest

from howard_spark.operators.similarity import (
    PLANES,
    embedding_neardup_lsh,
    lsh_plane_family,
)


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.RandomState(7)
    base = rng.standard_normal((200, 64)).astype("float32")
    pert = base + 0.05 * rng.standard_normal((200, 64)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(200)] + \
           [(1000 + i, pert[i].tolist()) for i in range(200)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    truth = {(i, 1000 + i) for i in range(200)}  # cos ~0.999 each
    return e, truth


def _run(e, bits, bands):
    out = embedding_neardup_lsh(e, bits, bands, threshold=-2.0).collect()
    found = {(r["vec_a"], r["vec_b"]) for r in out if r["cos_sim"] > 0.9}
    return len(out), found


def test_wider_bands_cut_candidates_keep_neardup_recall(planted):
    e, truth = planted
    cand4, found4 = _run(e, 4, 2)
    cand8, found8 = _run(e, 8, 2)
    # measured: 9834 -> 924 candidates; recall 198 -> 199 of 200
    assert cand8 * 5 < cand4
    assert len(found4 & truth) >= 195
    assert len(found8 & truth) >= len(found4 & truth)


def test_more_bands_buy_recall_back(planted):
    e, truth = planted
    cand, found = _run(e, 8, 4)
    assert found & truth == truth          # measured: 200/200
    _, found2 = _run(e, 8, 2)
    assert len(found & truth) >= len(found2 & truth)


def test_plane_family_prefix_matches_gate_planes():
    """The q44 gate (4-bit x 2-band) must reproduce its DuckDB oracle:
    the generalized family's first 8 planes ARE the gate's PLANES."""
    assert lsh_plane_family(8) == PLANES
    assert lsh_plane_family(16)[:8] == PLANES
