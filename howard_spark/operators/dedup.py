"""Deduplication operators over the documents table.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash (bit-vote fingerprint), and n-gram Jaccard on
LSH candidate pairs.

Portability design: MinHash uses ``md5`` (identical hex in Spark and
DuckDB) so the whole shingle→minhash→band pipeline is
oracle-checkable SQL in both engines; the lexicographic min of md5
hex strings is a valid min-hash. SimHash needs bit surgery that isn't
portable, so it uses Spark ``xxhash64`` and is registered without an
oracle (rows-only check, as the driver contract allows).

Scale notes (the 100 TB story):
- shingling explodes ~SHINGLE_CAP rows per doc; the groupBy that
  follows is a map-side-combinable min() — partial aggregation keeps
  the shuffle tiny (one row per (doc, seed));
- the LSH band join is an equi-join on the band key: self-joins on
  banded signatures shuffle only (doc_id, band_key) pairs, never text;
- exact dedup shuffles only (hash, doc_id).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, t

N_HASHES = 8        # minhash signature length
BAND_ROWS = 2       # rows per LSH band -> 4 bands
SHINGLE_K = 9       # character shingle width
SHINGLE_CAP = 512   # max shingles per doc (prefix cap, both engines)


@query(
    "q30_exact_dedup",
    """
    SELECT h AS h, count(*) AS dup_count, min(doc_id) AS keeper
    FROM (SELECT doc_id, md5(text) AS h FROM documents)
    GROUP BY h
    HAVING count(*) > 1
    """,
)
def q30(spark, sf):
    """Exact dedup: md5-hash groupBy, keep the smallest doc_id."""
    d = t(spark, sf, "documents")
    return (
        d.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("dup_count"), F.min("doc_id").alias("keeper"))
        .where(F.col("dup_count") > 1)
    )


def _shingles_df(spark, sf):
    """doc_id × exploded character shingles (prefix-capped)."""
    d = t(spark, sf, "documents")
    shingles = F.expr(
        f"transform(sequence(1, least(greatest(length(text) - {SHINGLE_K - 1}, 1), {SHINGLE_CAP})), "
        f"i -> substring(text, i, {SHINGLE_K}))"
    )
    return d.select("doc_id", F.explode(shingles).alias("sh"))


_SHINGLES_SQL = f"""
        SELECT doc_id, substring(text, CAST(i AS INTEGER), {SHINGLE_K}) AS sh
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, greatest(least(length(text) - {SHINGLE_K - 1},
                                                  {SHINGLE_CAP}), 1) + 1)) AS i
            FROM documents
        )
"""

_MINHASH_SQL = f"""
        SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || sh)) AS mh
        FROM ({_SHINGLES_SQL}) s,
             (SELECT unnest(range({N_HASHES})) AS seed) seeds
        GROUP BY doc_id, seed
"""


@query(
    "q31_minhash_signatures",
    f"""
    SELECT doc_id, seed AS seed, mh AS mh
    FROM ({_MINHASH_SQL})
    """,
)
def q31(spark, sf):
    """MinHash signatures: per (doc, seed), min over shingles of
    md5(seed:shingle) — lexicographic min of hex == minhash. The
    min() is map-side combinable, so the shuffle carries one row per
    (doc, seed), not per shingle."""
    sh = _shingles_df(spark, sf)
    seeds = spark.range(N_HASHES).select(F.col("id").alias("seed"))  # long == DuckDB BIGINT
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select("doc_id", "seed", F.md5(F.concat_ws(":", "seed", "sh")).alias("h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )


_BANDS_SQL = f"""
        SELECT doc_id, seed // {BAND_ROWS} AS band,
               md5(string_agg(mh, '|' ORDER BY seed)) AS band_key
        FROM ({_MINHASH_SQL})
        GROUP BY doc_id, seed // {BAND_ROWS}
"""


@query(
    "q32_lsh_candidate_pairs",
    f"""
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def q32(spark, sf):
    """LSH banding: docs sharing any band of their minhash signature
    become candidate near-duplicate pairs. The self-join is an
    equi-join on (band, band_key) — tiny rows, shuffled once."""
    sig = q31(spark, sf)
    bands = (
        sig.withColumn("band", (F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.lpad("seed", 2, "0"), "mh"))))).alias("band_key"))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@query("q33_simhash")  # no oracle: 64-bit surgery isn't portable SQL
def q33(spark, sf):
    """SimHash fingerprint: xxhash64 per token, ±1 vote per bit, sign
    → 16-bit fingerprint (demonstration width). Registered rows-only."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = [
        F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(16)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(16):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return per_doc.select("doc_id", fp.cast("long").alias("simhash"))


@query(
    "q34_ngram_jaccard",
    f"""
    WITH pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ({_BANDS_SQL}) a JOIN ({_BANDS_SQL}) b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES_SQL})),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS i_cnt
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.doc_a
        JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
        GROUP BY p.doc_a, p.doc_b
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
    SELECT i.doc_a AS doc_a, i.doc_b AS doc_b,
           round(CAST(i.i_cnt AS DOUBLE) / (za.n + zb.n - i.i_cnt), 6) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    """,
)
def q34(spark, sf):
    """Exact n-gram Jaccard, evaluated only on LSH candidate pairs —
    the verify step of the MinHash pipeline. Joins are on (doc_id) /
    (doc_id, shingle); only candidate docs' shingle sets move."""
    pairs = q32(spark, sf)
    sh = _shingles_df(spark, sf).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b2"), F.col("sh").alias("sh_b"))
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("sh_b") == F.col("sh_a")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i_cnt"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        inter.join(za, "doc_a").join(zb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("i_cnt").cast("double")
                    / (F.col("n_a") + F.col("n_b") - F.col("i_cnt")), 6).alias("jaccard"),
        )
    )
