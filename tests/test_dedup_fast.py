"""q36 (xxhash64 fast-path minhash) equivalence guarantees vs q31.

q31 (md5) and q36 (xxhash64) are different LSH hash families, so their
candidate-pair sets legitimately differ on *near*-duplicates. What must
hold for ANY correct minhash implementation:

1. exact-duplicate documents (identical text => identical shingle set)
   produce identical signatures under every hash family, hence collide
   in every band -> every exact-dup pair is in BOTH pair sets;
2. signatures are deterministic (same input -> same output across runs);
3. the banding algebra is shared (band_pairs), so schemas agree.
"""

from pyspark.sql import functions as F

from howard_spark.operators.dedup import band_pairs, q31, q36


def _pairs(df):
    return set(map(tuple, df.collect()))


def test_exact_dup_pairs_survive_both_hash_families(spark, sf_dir, tmp_path):
    # deterministic fixture: sf0.001 docs + three planted exact duplicates
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    maxid_row = base.agg(F.max("doc_id").alias("m")).first()
    m = maxid_row["m"]
    dups = (
        base.where(F.col("doc_id").isin(0, 1, 2))
        .withColumn("doc_id", F.col("doc_id") + m + 1)
    )
    fixture = str(tmp_path / "dupfix")
    base.unionByName(dups).coalesce(1).write.parquet(f"{fixture}/documents.parquet")

    exact_pairs = {(0, m + 1), (1, m + 2), (2, m + 3)}
    p31 = _pairs(band_pairs(q31(spark, fixture)))
    p36 = _pairs(band_pairs(q36(spark, fixture)))
    assert exact_pairs <= p31, "md5 LSH must catch every exact dup"
    assert exact_pairs <= p36, "xxhash64 LSH must catch every exact dup"


def test_fast_minhash_deterministic(spark, sf_dir):
    a = q36(spark, sf_dir).orderBy("doc_id", "seed").collect()
    b = q36(spark, sf_dir).orderBy("doc_id", "seed").collect()
    assert a == b


def test_band_pairs_schema_agree(spark, sf_dir):
    s31 = band_pairs(q31(spark, sf_dir)).schema
    s36 = band_pairs(q36(spark, sf_dir)).schema
    assert [f.name for f in s31] == [f.name for f in s36] == ["doc_a", "doc_b"]
