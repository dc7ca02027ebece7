"""recall@k of the ANN configs is a MEASURED number (r4 verdict #3):
the report must stay self-consistent (brute == total), IVF recall must
be monotone in nprobe with a real floor, and the LSH configs report
honest (low) recall in this low-similarity regime — the documented
band-width trade-off, now pinned by numbers.

Measured at sf0.001 (deterministic data): ivf 90/114/141 of 160,
lsh_4x2 33, lsh_8x4 14."""

SF = "/root/testdata/sf0.001"


def test_ann_recall_report(spark):
    from howard_spark.operators.similarity import ann_recall_report

    rows = {r["config"]: (r["hits"], r["total"])
            for r in ann_recall_report(spark, SF).collect()}
    total = rows["brute"][1]
    assert rows["brute"][0] == total > 0

    r1, r2, r4 = (rows[f"ivf_nprobe{p}"][0] for p in (1, 2, 4))
    assert r1 <= r2 <= r4 <= total
    assert r4 >= 0.75 * total   # measured 0.88
    assert r1 >= 0.40 * total   # measured 0.56

    # LSH at low similarity: wide bands lose recall (docstring claim,
    # measured 0.21 / 0.09) — assert the ORDER and non-vacuousness
    assert rows["lsh_4x2"][0] >= rows["lsh_8x4"][0] > 0
