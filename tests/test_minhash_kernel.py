"""_minhash_kernel (round-6 vectorized md5 minhash) must reproduce the
JVM expression pipeline byte-for-byte — including the edge cases the
vectorized fast path cannot take (short docs, non-ASCII text, NULL
text, empty text), which exercise the exact per-doc Python path."""

from pyspark.sql import functions as F

from howard_spark.operators.dedup import (
    N_HASHES,
    SHINGLE_CAP,
    SHINGLE_K,
    _minhash_wide,
)


def _jvm_wide(spark, sf):
    """The r5 JVM shape: explode shingles, min(md5(seed:sh)) per doc."""
    d = spark.read.parquet(f"{sf}/documents.parquet")
    shingles = F.expr(
        f"transform(sequence(1, least(greatest(length(text) - {SHINGLE_K - 1}, 1), {SHINGLE_CAP})), "
        f"i -> substring(text, i, {SHINGLE_K}))"
    )
    sh = d.select("doc_id", F.explode(shingles).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(str(s)), "sh"))).alias(f"mh{s}")
        for s in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _assert_identical(spark, sf):
    kern = _minhash_wide(spark, sf)
    jvm = _jvm_wide(spark, sf)
    assert kern.exceptAll(jvm).isEmpty() and jvm.exceptAll(kern).isEmpty()


def test_kernel_matches_jvm_on_corpus(spark, sf_dir):
    _assert_identical(spark, sf_dir)


def test_shingle_sets_kernel_matches_jvm(spark, sf_dir, tmp_path):
    """shingle_sets_df must reproduce the JVM
    distinct -> collect_list/count fold as a SET per doc (order-free:
    consumers use array_intersect/size only) — on the corpus AND the
    edge fixture (incl. the NULL-text doc whose NULL shingle counts in
    n but is excluded from shs, matching collect_list)."""
    from pyspark.sql import functions as F

    from howard_spark.operators.dedup import _shingles_df, shingle_sets_df

    def jvm_sets(sf):
        return (_shingles_df(spark, sf).distinct().groupBy("doc_id")
                .agg(F.collect_list("sh").alias("shs"),
                     F.count("*").alias("n")))

    def norm(df):
        return df.select("doc_id", F.array_sort("shs").alias("shs"), "n")

    for sf in [sf_dir]:
        a, b = norm(jvm_sets(sf)), norm(shingle_sets_df(spark, sf))
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    rows = [(0, "abc"), (1, None), (2, "héllo wörld — unicode, long enough"),
            (4, ""), (5, "exactly9!"), (6, "xy" * 1000)]
    fixture = str(tmp_path / "setsfix")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{fixture}/documents.parquet")
    a, b = norm(jvm_sets(fixture)), norm(shingle_sets_df(spark, fixture))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_numpy_xxh64_matches_spark(spark):
    """The numpy XXH64 must equal F.xxhash64(lit(seed), col) for every
    byte length through all tail-step branches (0..100 covers the
    32-byte stripe loop, merge rounds, 8/4/1-byte tails), unicode, and
    the NULL-skip fold semantics."""
    import numpy as np
    from pyspark.sql import functions as F

    from howard_spark.operators.dedup import _xxh64_bytes_rows, _xxh64_int

    strings = ["", "é中文", "héllo wörld", "with:colon|pipe"] + \
        ["x" * n for n in range(1, 101)] + ["abcdefghi", "0:abcdefghi"]
    rows = [(i, s) for i, s in enumerate(strings)] + [(len(strings), None)]
    df = spark.createDataFrame(rows, "i int, s string")
    for seed in (0, 3, 7):
        expect = {r["i"]: r["h"] for r in df.select(
            "i", F.xxhash64(F.lit(seed), F.col("s")).alias("h")).collect()}
        sv = _xxh64_int(seed, 42)
        for i, s in enumerate(strings):
            b = s.encode("utf-8")
            B = np.frombuffer(b, dtype=np.uint8).reshape(1, len(b)) \
                if b else np.empty((1, 0), dtype=np.uint8)
            got = int(_xxh64_bytes_rows(B, sv).view(np.int64)[0])
            assert got == expect[i], (seed, s)
        assert int(np.uint64(sv).view(np.int64)) == expect[len(strings)]


def test_fast_kernel_matches_jvm(spark, sf_dir, tmp_path):
    """q36's kernel must reproduce the r5 JVM inline xxhash64 pipeline
    exactly — corpus and edge docs."""
    from pyspark.sql import functions as F

    from howard_spark.operators.dedup import (
        N_HASHES as NH,
        _minhash_wide,
        _shingles_df,
    )

    def jvm_fast(sf):
        sh = _shingles_df(spark, sf)
        aggs = [F.min(F.xxhash64(F.lit(s), F.col("sh"))).alias(f"mh{s}")
                for s in range(NH)]
        return sh.groupBy("doc_id").agg(*aggs)

    for sf in [sf_dir]:
        a, b = jvm_fast(sf), _minhash_wide(spark, sf, fast=True)
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    rows = [(0, "abc"), (1, None), (2, "héllo wörld — unicode, long enough"),
            (4, ""), (5, "exactly9!"), (6, "xy" * 1000)]
    fixture = str(tmp_path / "fastfix")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{fixture}/documents.parquet")
    a, b = jvm_fast(fixture), _minhash_wide(spark, fixture, fast=True)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_kernel_matches_jvm_on_edge_docs(spark, tmp_path):
    rows = [
        (0, "abc"),                          # shorter than SHINGLE_K
        (1, None),                           # NULL text -> md5(seed) row
        (2, "héllo wörld — unicode text long enough for windows"),
        (3, "normal ascii document, long enough for many windows"),
        (4, ""),                             # empty -> one empty shingle
        (5, "exactly9!"),                    # len == SHINGLE_K
        (6, "x" * 2000),                     # SHINGLE_CAP clamp
    ]
    fixture = str(tmp_path / "edgefix")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .coalesce(1).write.parquet(f"{fixture}/documents.parquet")
    _assert_identical(spark, fixture)
    out = _minhash_wide(spark, fixture).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3, 4, 5, 6]
