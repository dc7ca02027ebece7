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
