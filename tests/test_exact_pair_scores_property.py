"""Property test for the round-5 exact-verify kernel: on random small
corpora, exact_pair_scores returns identical rows under all three join
strategies (auto / forced broadcast / forced shuffle), and the scores
match a serial pure-Python set-intersection oracle — the semi-join
restriction and the join-strategy switch are pure optimizations."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from howard_spark.operators.dedup import (SHINGLE_CAP, SHINGLE_K,
                                          exact_pair_scores)

BASE = st.text(alphabet="ab", min_size=SHINGLE_K, max_size=30)


@st.composite
def corpora(draw):
    bases = draw(st.lists(BASE, min_size=2, max_size=4))
    texts = list(bases)
    for b in bases:
        if draw(st.booleans()):
            texts.append(b + draw(st.sampled_from(["", "a", "ba"])))
    return texts


def _shingles(t: str) -> set[str]:
    n = max(min(len(t) - (SHINGLE_K - 1), SHINGLE_CAP), 1)
    return {t[i:i + SHINGLE_K] for i in range(n)}


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora())
def test_exact_pair_scores_modes_and_oracle(spark, texts):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    sh_expr = F.expr(
        f"transform(sequence(1, least(greatest(length(text) - {SHINGLE_K - 1}, 1), "
        f"{SHINGLE_CAP})), i -> substring(text, i, {SHINGLE_K}))")
    sh = docs.select("doc_id", F.explode(sh_expr).alias("sh")).distinct()
    # candidate pairs: all i<j (small n — the kernel contract is about
    # scoring, not candidate generation)
    a = docs.select(F.col("doc_id").alias("doc_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"))
    pairs = a.crossJoin(b).where(F.col("doc_a") < F.col("doc_b"))

    results = {}
    for mode in ("auto", "broadcast", "shuffle"):
        results[mode] = sorted(map(tuple, exact_pair_scores(
            pairs, sh, join_mode=mode).collect()))
    assert results["auto"] == results["broadcast"] == results["shuffle"]

    sets = {i: _shingles(t) for i, t in enumerate(texts)}
    expected = sorted(
        (i, j, len(sets[i] & sets[j]),
         len(sets[i]) + len(sets[j]) - len(sets[i] & sets[j]))
        for i in sets for j in sets if i < j)
    assert results["auto"] == expected
