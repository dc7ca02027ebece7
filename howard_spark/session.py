"""SparkSession factory with scale-appropriate defaults.

Replaces the reference's connexion setup (duckdb PRAGMA threads /
memory_limit, /root/reference/howard/objects/variants.py:310-354;
howard/main.py:171-188) with Spark equivalents: AQE on (runtime
re-planning + skew-join splitting), Arrow transfers on, shuffle
partitions sized to the core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "howard_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime (AQE) broadcast decisions use this bar against ACTUAL
        # materialized sizes — 64m is comfortably inside executor memory
        # and lets mid-size dimension tables (e.g. the semi-join-restricted
        # shingle-set table of exact_pair_scores) take the broadcast plan;
        # above it joins stay shuffle equi-joins. 10m (the default) was
        # tuned for 1g executors, not this profile.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("HS_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
