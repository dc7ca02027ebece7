"""IVF coarse quantizer: the Lloyd training must actually move the
centroids off their seeds (guards against a silent fall-back to the
round-2 stand-in) and keep them broadcastable-small."""

from pyspark.sql import functions as F

from howard_spark.operators.similarity import (
    DIM, N_CENTROIDS, kmeans_centroids,
)


def test_kmeans_trains_real_centroids(spark):
    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    cent = kmeans_centroids(e).collect()
    assert 1 <= len(cent) <= N_CENTROIDS
    seeds = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in e.where(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_CENTROIDS)
        ).collect()
    }
    moved = 0
    for r in cent:
        ce = [float(x) for x in r["ce"]]
        assert len(ce) == DIM
        if ce != seeds[r["cid"]]:
            moved += 1
    assert moved >= 1  # Lloyd updates happened; centroids are means now


def test_kmeans_deterministic(spark):
    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    a = sorted((r["cid"], tuple(r["ce"])) for r in kmeans_centroids(e).collect())
    b = sorted((r["cid"], tuple(r["ce"]))
               for r in kmeans_centroids(e.repartition(5)).collect())
    assert a == b


def test_quantize_roundtrip_error_bound(spark):
    from pyspark.sql import functions as F

    from howard_spark.operators.similarity import (
        QUANT_LEVELS, dequantize_embeddings, quantize_embeddings,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_embeddings(e)
    back = dequantize_embeddings(q).withColumnRenamed("embedding", "deq")
    joined = (e.select("vec_id", "embedding").join(back, "vec_id")
              .join(q.select("vec_id", "qscale"), "vec_id"))
    err = joined.select(
        F.expr("aggregate(zip_with(embedding, deq, (a, b) -> "
               "abs(CAST(a AS DOUBLE) - b)), 0D, (m, v) -> greatest(m, v))")
        .alias("max_err"),
        (F.col("qscale") / 2 + 1e-12).alias("bound"))
    assert err.where(F.col("max_err") > F.col("bound")).count() == 0
    # codes stay in the 8-bit range
    assert q.where(F.expr(
        f"array_max(codes) > {QUANT_LEVELS} OR array_min(codes) < 0"
    )).count() == 0


def test_quantized_ann_top1_survives(spark):
    """Recall sanity: brute-force top-1 neighbor of the query is
    unchanged after int8 quantize -> dequantize."""
    from pyspark.sql import functions as F

    from howard_spark.operators.similarity import (
        _cosine, dequantize_embeddings, quantize_embeddings,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def top1(df):
        qvec = df.where(F.col("vec_id") == 0).first()["embedding"]
        qlit = F.array(*[F.lit(float(x)) for x in qvec])
        return (df.where(F.col("vec_id") != 0).withColumn("q", qlit)
                .select("vec_id", _cosine("embedding", "q").alias("c"))
                .orderBy(F.desc("c"), F.asc("vec_id")).first()["vec_id"])

    exact = top1(e.select("vec_id", "embedding"))
    deq = dequantize_embeddings(quantize_embeddings(e))
    assert top1(deq) == exact


def test_ivf_nprobe_recall(spark):
    """nprobe=2 recall vs brute force is at least nprobe=1 recall, and
    both paths return subsets of the true ranking."""
    from howard_spark.operators.similarity import q40, q45, q48

    sf = "/root/testdata/sf0.001"
    exact = [r["vec_id"] for r in q40(spark, sf).collect()]
    n1 = {r["vec_id"] for r in q45(spark, sf).collect()}
    n2 = {r["vec_id"] for r in q48(spark, sf).collect()}
    r1 = len(n1 & set(exact))
    r2 = len(n2 & set(exact))
    assert r2 >= r1  # widening the probe never loses recall
    assert r2 > 0


def test_kmeans_sampled_training_quality(spark):
    """Train-on-sample (the 100-TB mode): the 25% md5-sampled trainer
    must produce a clustering whose mean within-cluster cosine is close
    to the full-data trainer's — assignments can legitimately flip on
    boundary vectors (measured 55.8% raw agreement at sf0.001 on these
    weakly-clustered synthetic embeddings), but the OBJECTIVE must not
    degrade more than a few percent."""
    import pyspark.sql.functions as F

    from howard_spark.operators.similarity import (
        KM_SAMPLE_FRACTION,
        _cosine,
        _kmeans_assign,
        km_sample_pred,
        kmeans_centroids,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def mean_cos(cent):
        a = _kmeans_assign(e, cent)
        scored = a.join(F.broadcast(cent), "cid").select(
            _cosine("embedding", "ce").alias("cos"))
        return scored.agg(F.avg("cos")).first()[0]

    # measured at sf0.001: full 0.2561, sampled 0.2271 (ratio 0.887) —
    # deterministic data, so 0.85 is a stable floor
    full = mean_cos(kmeans_centroids(e))
    samp = mean_cos(kmeans_centroids(e, sample_fraction=KM_SAMPLE_FRACTION))
    assert samp >= 0.85 * full, (full, samp)

    # the sample predicate is deterministic and ~25% (16ths granularity)
    n = e.count()
    ns = e.where(km_sample_pred(KM_SAMPLE_FRACTION)).count()
    assert 0.15 * n <= ns <= 0.35 * n


def test_sample_fraction_edge_cases(spark):
    """ADVICE r4: fraction>=1.0 means NO filter (not a 15/16 clamp);
    fractions below the 1/16 md5-hex-digit granularity floor raise
    instead of silently rounding up."""
    import pytest

    from howard_spark.operators.similarity import (_km_sample_digits,
                                                   km_sample_pred,
                                                   kmeans_centroids)

    assert _km_sample_digits(1.0) == "0123456789abcdef"
    assert _km_sample_digits(0.5) == "01234567"
    with pytest.raises(ValueError):
        _km_sample_digits(0.01)

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # fraction=1.0 trains on every vector: identical to no sampling
    full = {(r["cid"], tuple(r["ce"]))
            for r in kmeans_centroids(e).collect()}
    all_frac = {(r["cid"], tuple(r["ce"]))
                for r in kmeans_centroids(e, sample_fraction=1.0).collect()}
    assert full == all_frac
    assert e.where(km_sample_pred(1.0)).count() == e.count()
