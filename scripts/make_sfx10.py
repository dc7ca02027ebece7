#!/usr/bin/env python3
"""Regenerate the x10 (sf1.0-row-count) bench dir at /tmp/sfx10.

Derives a deterministic 10x replica of every big sf0.1 table so the
frozen bench can be exercised at the driver's sf1.0 row counts
(lineitem 6M, orders 1.5M, documents 50k, embeddings 20k, events 1M);
dimension tables are copied as-is. Same perturbation recipe as
scripts/big_regime_bench.py: documents get a replica prefix (shingles
and minhashes differ per replica — pair-stage queries stay honestly
hard), embeddings a tiny per-replica per-dimension offset. Fact-table
keys are offset by rep*10_000_000 consistently across lineitem/orders
so the join fan-out matches a genuinely bigger corpus.

Usage: python scripts/make_sfx10.py [dest_dir]   (default /tmp/sfx10)
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X = 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"


def main() -> None:
    from pyspark.sql import functions as F

    from howard_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="howard_spark-make-sfx10", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DEST, exist_ok=True)

    reps = spark.range(X).select(F.col("id").alias("rep"))
    off = F.col("rep") * 10_000_000

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    (docs.crossJoin(reps)
     .select((F.col("doc_id") + off).alias("doc_id"),
             F.when(F.col("rep") == 0, F.col("text"))
             .otherwise(F.concat(F.lit("v"), F.col("rep").cast("string"),
                                 F.lit(" "), F.col("text"))).alias("text"),
             "lang", "source", "n_chars")
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{DEST}/documents.parquet"))

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    (emb.crossJoin(reps)
     .select((F.col("vec_id") + off).alias("vec_id"),
             F.expr("transform(embedding, (x, i) -> CAST(x + rep * 0.003 * "
                    "sin(CAST(i AS DOUBLE) + CAST(rep AS DOUBLE)) AS FLOAT))")
             .alias("embedding"),
             "label")
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{DEST}/embeddings.parquet"))

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    (li.crossJoin(reps)
     .select((F.col("l_orderkey") + off).alias("l_orderkey"),
             *[c for c in li.columns if c != "l_orderkey"])
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{DEST}/lineitem.parquet"))

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    (orders.crossJoin(reps)
     .select((F.col("o_orderkey") + off).alias("o_orderkey"),
             *[c for c in orders.columns if c != "o_orderkey"])
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{DEST}/orders.parquet"))

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    (ev.crossJoin(reps)
     .select((F.col("event_id") + off).alias("event_id"),
             *[c for c in ev.columns if c != "event_id"])
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{DEST}/events.parquet"))

    for dim in ("customer", "nation", "part", "region", "supplier"):
        shutil.copy(f"{SRC}/{dim}.parquet", f"{DEST}/{dim}.parquet")

    for tname in ("lineitem", "orders", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{DEST}/{tname}.parquet").count()
        print(f"{tname}: {n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
