"""DuckDB / SQLite attach (S5) and database discovery (S14).

The reference attaches .duckdb/.db files into its embedded engine
(/root/reference/howard/objects/database.py:1420-1468) and scans
database folders (:862). Spark-side the same surface is a READ bridge:

- small tables: one driver-side Arrow fetch -> createDataFrame;
- large tables: partitioned fetch — each task opens its own READ-ONLY
  connection and pulls a rowid range (the per-executor-handle pattern;
  DuckDB/SQLite files are single-file and seekable on shared storage).

Write-back stays Spark-native (parquet) by design: the engine's sink
is its own encoded format, not an embedded row store.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession

DISCOVER_EXTS = {
    ".duckdb": "duckdb",
    ".db": "sqlite",
    ".sqlite": "sqlite",
    ".parquet": "parquet",
    ".csv": "csv",
    ".tsv": "tsv",
    ".vcf": "vcf",
    ".json": "json",
    ".bed": "bed",
}


def discover_databases(folders: list[str] | str) -> list[dict]:
    """Scan folders for attachable databases (ref database.py:862).
    Returns [{path, format, tables?}] — tables listed for embedded DBs."""
    if isinstance(folders, str):
        folders = [folders]
    out = []
    for folder in folders:
        if not os.path.isdir(folder):
            continue
        for root, _dirs, files in os.walk(folder):
            for fn in sorted(files):
                base = fn[:-3] if fn.endswith(".gz") else fn
                ext = os.path.splitext(base)[1].lower()
                fmt = DISCOVER_EXTS.get(ext)
                if not fmt:
                    continue
                entry = {"path": os.path.join(root, fn), "format": fmt}
                try:
                    if fmt == "duckdb":
                        entry["tables"] = list_tables_duckdb(entry["path"])
                    elif fmt == "sqlite":
                        entry["tables"] = list_tables_sqlite(entry["path"])
                except Exception:
                    entry["tables"] = None  # unreadable -> still discovered
                out.append(entry)
    return out


def list_tables_duckdb(path: str) -> list[str]:
    import duckdb

    con = duckdb.connect(path, read_only=True)
    try:
        return [r[0] for r in con.execute("SHOW TABLES").fetchall()]
    finally:
        con.close()


def list_tables_sqlite(path: str) -> list[str]:
    import sqlite3

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
        ).fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def _duckdb_arrow(path: str, sql: str) -> pa.Table:
    import duckdb

    con = duckdb.connect(path, read_only=True)
    try:
        return con.execute(sql).arrow()
    finally:
        con.close()


def read_duckdb(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    sql: str | None = None,
    partitions: int = 1,
) -> DataFrame:
    """Attach a DuckDB file as a DataFrame (S5).

    partitions=1: one driver-side Arrow fetch (annotation DBs are dims).
    partitions>1: each task SELECTs its rowid stripe over its own
    read-only connection — the scan distributes without moving the file.
    """
    if sql is not None:
        if partitions > 1:
            raise ValueError(
                "partitioned reads work on tables (rowid stripes); "
                "wrap custom sql in a view or read it driver-side"
            )
    elif table is None:
        raise ValueError("need table or sql")
    else:
        sql = f'SELECT * FROM "{table}"'
    if partitions <= 1:
        tbl = _duckdb_arrow(path, sql)
        return spark.createDataFrame(tbl.to_pandas())

    from pyspark.sql.pandas.types import from_arrow_schema

    # rowid-range stripes: each task scans only its rowid predicate —
    # no per-task ORDER BY / OFFSET re-scan; stripes partition the rowid
    # domain exactly (gaps from deletes just make some stripes lighter)
    n = _duckdb_arrow(
        path, f'SELECT coalesce(max(rowid), -1) + 1 AS n FROM "{table}"'
    ).column("n")[0].as_py()
    out_schema = from_arrow_schema(
        _duckdb_arrow(path, f"SELECT * FROM ({sql}) LIMIT 0").schema)
    step = (n + partitions - 1) // max(partitions, 1) or 1
    bounds = [(i * step, min((i + 1) * step, n)) for i in range(partitions)
              if i * step < n]
    if not bounds:  # empty table: repartition(0) would raise
        return spark.createDataFrame([], out_schema)

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import duckdb

        for pdf in pdfs:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                con = duckdb.connect(path, read_only=True)
                try:
                    out = con.execute(
                        f'SELECT * FROM "{table}" '
                        f"WHERE rowid >= {lo} AND rowid < {hi}"
                    ).arrow().to_pandas()
                finally:
                    con.close()
                yield out

    ranges = spark.createDataFrame(bounds, "lo long, hi long").repartition(len(bounds))
    return ranges.mapInPandas(kernel, out_schema)


def read_sqlite(
    spark: SparkSession,
    path: str,
    table: str | None = None,
    sql: str | None = None,
) -> DataFrame:
    """Attach a SQLite file as a DataFrame (S5, stdlib sqlite3)."""
    import sqlite3

    if sql is None:
        if table is None:
            raise ValueError("need table or sql")
        sql = f'SELECT * FROM "{table}"'
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        pdf = pd.read_sql_query(sql, con)
    finally:
        con.close()
    return spark.createDataFrame(pdf)
