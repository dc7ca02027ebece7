"""Operator library: each query is a (Spark DataFrame program, DuckDB
oracle SQL) pair registered under one name — the driver contract's
correctness gate (see __spark_entry__.py).

Column-name discipline: the driver's compare sorts columns by NAME
before hashing values, so every computed column is aliased identically
in the Spark code and the oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

QUERIES: dict[str, Callable] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def t(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all():
    from . import relational  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import encode_queries  # noqa: F401
    from . import hgvs_queries  # noqa: F401
    from . import transcripts_queries  # noqa: F401
    return QUERIES, ORACLES
