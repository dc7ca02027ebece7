"""Focused non-Spark unit tests for the round-6 kernel invariants.

These pin, as committed tests, two equivalences that were proven by
session-time A/B during the optimization round:

1. `_batch_windows` fast path (Arrow hash dictionary_encode + rank
   remap) produces output element-identical to an `np.unique` reference
   — for BOTH vocab encodings: k=9 (7-bit uint64 packing) and k=16
   (fixed-size-binary). The remap is what makes the O(n) hash swap
   provably order-identical to the old O(n log n) sort; if it breaks,
   downstream set element order and rank minima silently change.

2. `_grouped_pair_kernel` (BLAS gram prefilter at threshold - 1e-6,
   then sequential-fold recompute) emits cos_raw values BIT-IDENTICAL
   to a naive exact per-pair sequential fold, and exactly the pair set
   whose exact cosine clears the prefilter cut.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from howard_spark.operators.dedup import _batch_windows
from howard_spark.operators.similarity import (
    _COS_PREFILTER_MARGIN,
    _grouped_pair_kernel,
)


def _windows_reference(ids, texts, k, cap):
    """The old np.unique shape: lexicographic vocab + inverse."""
    all_w, n_sh = [], []
    for txt in texts:
        n = min(max(len(txt) - (k - 1), 1), cap)
        ws = [txt[j:j + k].encode() for j in range(n)]
        all_w.extend(ws)
        n_sh.append(len(ws))
    arr = np.array(all_w, dtype=f"S{k}")
    uniq, inv = np.unique(arr, return_inverse=True)
    n_sh = np.asarray(n_sh)
    seg = np.cumsum(n_sh) - n_sh
    return np.asarray(ids), inv, seg, uniq.tolist()


def _ascii_corpus(rng, n_docs, k):
    # repeated fragments force cross-doc duplicate windows; lengths
    # straddle the cap-clamp and the >= k floor of the fast path
    frags = ["the quick brown fox ", "jumps over the lazy dog ",
             "pack my box with five dozen ", "liquor jugs "]
    texts = []
    for i in range(n_docs):
        reps = int(rng.integers(1, 6))
        picks = rng.integers(0, len(frags), size=reps)
        texts.append(("doc%03d " % i) + "".join(frags[p] for p in picks))
    assert all(len(t) >= k for t in texts)
    return texts


@pytest.mark.parametrize("k,cap", [(9, 512), (16, 512), (9, 7), (16, 11)])
def test_batch_windows_fast_path_matches_np_unique(k, cap):
    rng = np.random.default_rng(42)
    texts = _ascii_corpus(rng, 40, k)
    ids = np.arange(40, dtype=np.int64) * 7 + 3
    tb = pa.record_batch(
        [pa.array(ids), pa.array(texts)], names=["doc_id", "text"])

    got_ids, got_inv, got_seg, got_words = _batch_windows(tb, k, cap)
    ref_ids, ref_inv, ref_seg, ref_words = _windows_reference(
        ids, texts, k, cap)

    assert got_words == ref_words            # exact vocab, exact order
    np.testing.assert_array_equal(got_ids, ref_ids)
    np.testing.assert_array_equal(got_inv, ref_inv)
    np.testing.assert_array_equal(got_seg, ref_seg)
    # sanity: the corpus really exercised dedup + both-path widths
    assert len(got_words) < len(got_inv)


def test_batch_windows_fast_path_requires_remap():
    # a batch whose first-appearance order differs from lexicographic
    # order — the case the rank remap exists for
    texts = ["zzzzzzzzzzzz", "aaaaaaaaaaaa", "mmmmmmmmmmmm"]
    ids = np.array([5, 1, 9], dtype=np.int64)
    tb = pa.record_batch(
        [pa.array(ids), pa.array(texts)], names=["doc_id", "text"])
    _, inv, _, words = _batch_windows(tb, 9, 512)
    assert words == sorted(words)
    ref = _windows_reference(ids, texts, 9, 512)
    assert words == ref[3]
    np.testing.assert_array_equal(inv, ref[1])


def _naive_pairs(ids, E32, cut):
    """Exact sequential-fold cosine for every (a < b) pair."""
    E = E32.astype(np.float64)
    m, d = E.shape
    order = np.argsort(ids)
    ids, E = ids[order], E[order]

    def nrm(v):
        acc = 0.0
        for k in range(d):
            acc += v[k] * v[k]
        return np.sqrt(acc)

    out = {}
    for i in range(m):
        for j in range(i + 1, m):
            acc = 0.0
            for k in range(d):
                acc += E[i, k] * E[j, k]
            c = acc / (nrm(E[i]) * nrm(E[j]))
            if c > cut:
                a, b = int(ids[i]), int(ids[j])
                out[(a, b)] = c
    return out


def test_grouped_pair_kernel_bit_exact_vs_naive_fold():
    rng = np.random.default_rng(7)
    m, d = 60, 16
    # clustered vectors so a meaningful fraction of pairs clears 0.9
    base = rng.normal(size=(4, d))
    E32 = (base[rng.integers(0, 4, size=m)]
           + 0.15 * rng.normal(size=(m, d))).astype(np.float32)
    ids = rng.permutation(np.arange(m, dtype=np.int64) * 13 + 2)

    tb = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(E32), type=pa.list_(pa.float32())),
    })
    got = _grouped_pair_kernel(0.9)(tb)
    got_map = {
        (a, b): c for a, b, c in zip(
            got.column("vec_a").to_pylist(),
            got.column("vec_b").to_pylist(),
            got.column("cos_raw").to_pylist())
    }
    ref_map = _naive_pairs(ids, E32, 0.9 - _COS_PREFILTER_MARGIN)
    assert len(ref_map) > 20                  # the fixture is non-trivial
    assert set(got_map) == set(ref_map)
    for key, ref_c in ref_map.items():
        assert got_map[key] == ref_c, key     # BIT-exact doubles


def test_grouped_pair_kernel_small_groups():
    empty = _grouped_pair_kernel(0.9)(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32()))}))
    assert empty.num_rows == 0
    single = _grouped_pair_kernel(0.9)(pa.table({
        "vec_id": pa.array([3], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0]], type=pa.list_(pa.float32()))}))
    assert single.num_rows == 0
    # identical pair -> cosine exactly 1.0, survives and is ordered a < b
    dup = _grouped_pair_kernel(0.9)(pa.table({
        "vec_id": pa.array([9, 4], type=pa.int64()),
        "embedding": pa.array([[1.0, 2.0, 3.0]] * 2,
                              type=pa.list_(pa.float32()))}))
    assert dup.num_rows == 1
    assert dup.column("vec_a").to_pylist() == [4]
    assert dup.column("vec_b").to_pylist() == [9]
    assert dup.column("cos_raw").to_pylist() == [1.0]
