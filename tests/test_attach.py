"""DuckDB / SQLite attach (S5) + database discovery (S14),
ref database.py:1420-1468 / :862."""

import duckdb
import sqlite3

import pytest

from howard_spark.sources.attach import (
    discover_databases,
    list_tables_duckdb,
    list_tables_sqlite,
    read_duckdb,
    read_sqlite,
)


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("attach")
    duck = str(d / "anno.duckdb")
    con = duckdb.connect(duck)
    con.execute("CREATE TABLE genes AS SELECT i AS gene_id, 'G' || i AS name, i * 1.5 AS score FROM range(1000) t(i)")
    con.execute("CREATE TABLE meta (k VARCHAR, v VARCHAR)")
    con.execute("INSERT INTO meta VALUES ('build', 'hg19')")
    con.close()

    sq = str(d / "clinvar.db")
    scon = sqlite3.connect(sq)
    scon.execute("CREATE TABLE sites (pos INTEGER, significance TEXT)")
    scon.executemany("INSERT INTO sites VALUES (?, ?)",
                     [(i, "benign" if i % 2 else "pathogenic") for i in range(50)])
    scon.commit()
    scon.close()
    return {"dir": str(d), "duck": duck, "sqlite": sq}


def test_discover(dbs):
    found = discover_databases(dbs["dir"])
    by_fmt = {e["format"]: e for e in found}
    assert set(by_fmt) == {"duckdb", "sqlite"}
    assert by_fmt["duckdb"]["tables"] == ["genes", "meta"]
    assert by_fmt["sqlite"]["tables"] == ["sites"]
    assert list_tables_duckdb(dbs["duck"]) == ["genes", "meta"]
    assert list_tables_sqlite(dbs["sqlite"]) == ["sites"]


def test_read_duckdb_driver(spark, dbs):
    df = read_duckdb(spark, dbs["duck"], table="genes")
    assert df.count() == 1000
    assert set(df.columns) == {"gene_id", "name", "score"}
    assert df.where("gene_id = 7").first()["name"] == "G7"


def test_read_duckdb_partitioned(spark, dbs):
    df = read_duckdb(spark, dbs["duck"], table="genes", partitions=4)
    assert df.count() == 1000
    # no duplicate / missing stripes
    assert df.select("gene_id").distinct().count() == 1000


def test_read_duckdb_sql(spark, dbs):
    df = read_duckdb(spark, dbs["duck"],
                     sql="SELECT name FROM genes WHERE gene_id < 5")
    assert sorted(r["name"] for r in df.collect()) == [f"G{i}" for i in range(5)]


def test_partitioned_custom_sql_rejected(spark, dbs):
    with pytest.raises(ValueError, match="tables"):
        read_duckdb(spark, dbs["duck"], sql="SELECT * FROM genes", partitions=2)


def test_read_sqlite(spark, dbs):
    df = read_sqlite(spark, dbs["sqlite"], table="sites")
    assert df.count() == 50
    assert df.where("significance = 'pathogenic'").count() == 25


def test_read_duckdb_partitioned_empty_table(spark, tmp_path):
    """partitions>1 on an empty table: must return an empty DataFrame
    with the right schema, not raise on repartition(0)."""
    path = str(tmp_path / "empty.duckdb")
    con = duckdb.connect(path)
    con.execute("CREATE TABLE nothing (a INTEGER, b VARCHAR)")
    con.close()
    df = read_duckdb(spark, path, table="nothing", partitions=4)
    assert df.count() == 0
    assert set(df.columns) == {"a", "b"}
