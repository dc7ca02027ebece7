"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k as the exact baseline, an LSH-bucketed
variant as the scale path, and embedding-cosine near-dup pairs.
Dot products run JVM-side via ``aggregate(zip_with(...))`` — no
Python in the hot path; DuckDB oracles use list_cosine_similarity /
list_dot_product on the same rows.

Scale notes: brute-force is a broadcast of the query vector over a
single scan (no shuffle until the global top-k, which AQE keeps to
one reduce). The LSH variant buckets by sign-bits of projections onto
deterministic hyperplanes, turning all-pairs search into an equi-join
on bucket — the 100-TB path.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import query, t

TOP_K = 20


def _dot_sql(a: str, b: str) -> str:
    """Double-precision dot product in DuckDB SQL, matching Spark's
    fold order (element order, f64 accumulation) bit-for-bit."""
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}), "
        f"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')"
    )


def _cosine_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"


def _cosine(a, b):
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    na = F.sqrt(F.expr(f"aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"))
    nb = F.sqrt(F.expr(f"aggregate({b}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"))
    return dot / (na * nb)


@query(
    "q40_ann_bruteforce",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id AS vec_id,
           round({_cosine_sql('e.embedding', 'q.qe')}, 6) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT {TOP_K}
    """,
)
def q40(spark, sf):
    """Brute-force cosine top-k vs the vec_id=0 query vector.

    The query vector is a collected literal (broadcast scalar), so the
    scan is embarrassingly parallel; only TOP_K rows reach the driver."""
    e = t(spark, sf, "embeddings")
    qvec = e.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        e.where(F.col("vec_id") != 0)
        .withColumn("q", qlit)
        .select("vec_id", F.round(_cosine("embedding", "q"), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "q41_dot_products_sample",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_dot_sql('a.embedding', 'b.embedding')}, 4) AS dot
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE a.vec_id % 20 = 0 AND b.vec_id % 20 = 10
    """,
)
def q41(spark, sf):
    """Pairwise dot products within label buckets (sampled grid) —
    the bucketed-join building block of embedding near-dup."""
    e = t(spark, sf, "embeddings")
    a = e.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
        F.col("embedding").alias("ea"))
    b = e.where(F.col("vec_id") % 20 == 10).select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
        F.col("embedding").alias("eb"))
    dot = F.expr("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", F.round(dot, 4).alias("dot"))
    )


@query("q42_ann_lsh")  # rows-only: hyperplane constants aren't portable SQL
def q42(spark, sf):
    """LSH-bucketed ANN: sign-bit buckets from 8 deterministic
    pseudo-random hyperplanes (seeded per dimension), then cosine only
    within the query's bucket. The all-pairs scan becomes an equi-join
    on bucket — the 100-TB scale path; brute-force q40 is the oracle
    for recall, LSH trades recall for a ~2^8 candidate reduction."""
    import numpy as np

    e = t(spark, sf, "embeddings")
    dim = len(e.select("embedding").first()["embedding"])
    rng = np.random.RandomState(42)
    planes = rng.standard_normal((8, dim))

    def bucket_expr(col):
        bits = []
        for i, p in enumerate(planes):
            arr = F.array(*[F.lit(float(x)) for x in p])
            proj = F.expr(
                f"aggregate(zip_with({col}, p{i}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
            )
            bits.append((proj, i))
        return bits

    df = e
    for i, p in enumerate(planes):
        df = df.withColumn(f"p{i}", F.array(*[F.lit(float(x)) for x in p]))
    bucket = None
    for i in range(8):
        proj = F.expr(
            f"aggregate(zip_with(embedding, p{i}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        )
        bit = F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    df = df.select("vec_id", "embedding", bucket.alias("bucket"))

    qrow = df.where(F.col("vec_id") == 0).first()
    qb, qvec = qrow["bucket"], qrow["embedding"]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    cand = df.where((F.col("bucket") == qb) & (F.col("vec_id") != 0))
    return (
        cand.withColumn("q", qlit)
        .select("vec_id", F.round(_cosine("embedding", "q"), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "q43_embedding_neardup",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.embedding', 'b.embedding')} > 0.9
    """,
)
def q43(spark, sf):
    """Embedding-cosine near-duplicate pairs within label buckets —
    the embedding flavor of dedup (threshold 0.9).

    Norms are computed ONCE per vector before the self-join (n rows),
    not once per pair (n² evaluations) — only the dot product runs
    inside the join."""
    # single small input file = one split; repartition so the O(n²/labels)
    # pair work spreads across cores (same reasoning as _shingles_df)
    e = t(spark, sf, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    norm = F.sqrt(F.expr(
        "aggregate(embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))"
    ))
    en = e.select("vec_id", "label", "embedding", norm.alias("nrm"))
    a = en.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
                  F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    b = en.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
                  F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    dot = F.expr("aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_sim_raw", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cos_sim_raw") > 0.9)
        .select("vec_a", "vec_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )
