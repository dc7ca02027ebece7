"""Property test: duplicated_spans vs a serial pure-Python oracle on
hypothesis-generated corpora (tiny alphabet forces real cross-doc gram
collisions; operator parameters shrunk so short docs exercise every
branch: sub-gram docs, cap truncation, run merging, min_span filter)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from howard_spark.operators.dedup import duplicated_spans

GRAM_W = 3
GRAM_CAP = 12
MIN_SPAN = 4

DOC = st.text(alphabet="abc", min_size=0, max_size=20)


def oracle(texts: list[str]) -> set[tuple[int, int, int]]:
    """Serial re-derivation: positional grams, cross-doc dup grams,
    gaps-and-islands merge, min_span filter. 1-based positions."""
    pos_idx = []  # (doc_id, pos, gram)
    for did, t in enumerate(texts):
        n = max(min(len(t) - (GRAM_W - 1), GRAM_CAP), 1)
        for i in range(1, n + 1):
            pos_idx.append((did, i, t[i - 1:i - 1 + GRAM_W]))
    docs_per_gram = {}
    for did, _, g in pos_idx:
        docs_per_gram.setdefault(g, set()).add(did)
    dup = {g for g, ds in docs_per_gram.items() if len(ds) >= 2}
    spans = set()
    for did, t in enumerate(texts):
        ps = sorted(p for (d, p, g) in pos_idx if d == did and g in dup)
        run_start = None
        prev = None
        for p in ps + [None]:
            if run_start is not None and (p is None or p != prev + 1):
                length = prev - run_start + GRAM_W
                if length >= MIN_SPAN:
                    spans.add((did, run_start, length))
                run_start = None
            if p is not None and run_start is None:
                run_start = p
            prev = p
    return spans


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(DOC, min_size=2, max_size=8))
def test_duplicated_spans_matches_serial_oracle(spark, texts, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("spans"))
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    got = {(r["doc_id"], r["span_start"], r["span_len"])
           for r in duplicated_spans(spark, sf, gram_w=GRAM_W,
                                     gram_cap=GRAM_CAP,
                                     min_span=MIN_SPAN).collect()}
    assert got == oracle(texts)
