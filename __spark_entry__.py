"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: documents through the full codec engine
                 (encode -> decode), sha-verified per lang.
queries()     -> one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
                 Exactly <=50 entries (the driver verifies at most 50
                 per round), ALL oracle-backed; near-duplicate and
                 engine-internal gates live in the extras tier
                 (howard_spark.operators.load_extras), covered by the
                 pytest parity suite and bench.py instead.
oracle_sql()  -> matching DuckDB SQL for every oracle-checkable query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode sf0.01 documents with the codec engine, decode,
    and report per-lang rows + sha-verified match counts (all must
    match). sf0.01 (r3 verdict #4: sf0.001 was contract-compliant but
    throughput-meaningless in the driver log)."""
    from howard_spark.encode import decode_df, encode_df

    sf = "/root/testdata/sf0.01"
    d = spark.read.parquet(f"{sf}/documents.parquet")
    enc = encode_df(d, chunk_rows=4096)
    dec = decode_df(enc, d.schema)

    src = d.select("doc_id", F.sha2("text", 256).alias("src_sha"))
    out = dec.select("doc_id", "lang", F.sha2("text", 256).alias("dec_sha"))
    return (
        out.join(src, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("src_sha") == F.col("dec_sha"), 1).otherwise(0)).alias("sha_ok"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from howard_spark.operators import load_all

    q, _ = load_all()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    from howard_spark.operators import load_all

    _, o = load_all()
    return dict(o)
