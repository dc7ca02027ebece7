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

# Non-driver registry: still oracle-checked by tests/test_oracle_parity.py
# and runnable by bench.py, but NOT exported through __spark_entry__.
# The driver verifies at most 50 gates per round (r3: 7 of 57 fell
# outside its window); near-duplicate / rows-only gates live here so
# every DRIVER gate gets a CORRECTNESS row every round.
EXTRA_QUERIES: dict[str, Callable] = {}
EXTRA_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None, driver: bool = True):
    q_reg, o_reg = (QUERIES, ORACLES) if driver else (EXTRA_QUERIES, EXTRA_ORACLES)

    def deco(fn):
        q_reg[name] = fn
        if oracle is not None:
            o_reg[name] = oracle
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


def load_extras():
    """Non-driver gates (see EXTRA_QUERIES above): same calling
    convention, oracle-checked by the pytest parity suite only."""
    load_all()
    return EXTRA_QUERIES, EXTRA_ORACLES
