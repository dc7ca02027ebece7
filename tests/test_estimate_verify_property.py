"""Property test: dedup_estimate_verify's decision table re-derived by
a serial pure-Python oracle (md5 minhash -> banding -> estimate ->
borderline exact) on random small corpora. Locks the routing contract:
accept/reject rows never pay exact scoring, borderline rows always do,
and the is_dup verdicts follow the documented thresholds exactly."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from howard_spark.operators.dedup import (
    BAND_ROWS,
    DUP_DEN,
    DUP_NUM,
    EST_HI,
    EST_LO,
    N_HASHES,
    SHINGLE_CAP,
    SHINGLE_K,
    dedup_estimate_verify,
)

# near-dup-prone corpora: few long-ish docs over a tiny alphabet, with
# explicit duplicates mixed in
BASE = st.text(alphabet="ab", min_size=SHINGLE_K, max_size=30)


@st.composite
def corpora(draw):
    bases = draw(st.lists(BASE, min_size=2, max_size=4))
    texts = list(bases)
    for b in bases:
        if draw(st.booleans()):
            texts.append(b + draw(st.sampled_from(["", "a", "ba"])))
    return texts


def _shingles(t: str) -> list[str]:
    n = max(min(len(t) - (SHINGLE_K - 1), SHINGLE_CAP), 1)
    return [t[i:i + SHINGLE_K] for i in range(n)]


def _sig(t: str) -> list[str]:
    sh = _shingles(t)
    return [min(hashlib.md5(f"{s}:{x}".encode()).hexdigest() for x in sh)
            for s in range(N_HASHES)]


def oracle(texts):
    sigs = {i: _sig(t) for i, t in enumerate(texts)}
    sets = {i: set(_shingles(t)) for i, t in enumerate(texts)}
    # banding: same key derivation as band_pairs
    pairs = set()
    for b in range(N_HASHES // BAND_ROWS):
        buckets = {}
        for i, s in sigs.items():
            parts = sorted(f"{x:02d}:{s[x]}"
                           for x in range(b * BAND_ROWS, (b + 1) * BAND_ROWS))
            buckets.setdefault("|".join(parts), []).append(i)
        for ds in buckets.values():
            for a in ds:
                for c in ds:
                    if a < c:
                        pairs.add((a, c))
    rows = set()
    for a, c in pairs:
        est = sum(1 for s in range(N_HASHES) if sigs[a][s] == sigs[c][s])
        if est >= EST_HI:
            rows.add((a, c, est, "accept_est", None, None, 1))
        elif est < EST_LO:
            rows.add((a, c, est, "reject_est", None, None, 0))
        else:
            i_cnt = len(sets[a] & sets[c])
            u_cnt = len(sets[a] | sets[c])
            dup = 1 if i_cnt * DUP_DEN >= u_cnt * DUP_NUM else 0
            rows.add((a, c, est, "exact", i_cnt, u_cnt, dup))
    return rows


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=corpora())
def test_estimate_verify_matches_serial_oracle(spark, texts, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("ev"))
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {(r["doc_a"], r["doc_b"], r["est_matches"], r["path"],
            r["i_cnt"], r["u_cnt"], r["is_dup"])
           for r in dedup_estimate_verify(spark, sf).collect()}
    assert got == oracle(texts)
