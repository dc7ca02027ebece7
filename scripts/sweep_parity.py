#!/usr/bin/env python3
"""Cross-SF oracle parity sweep: run EVERY oracle-checked gate's Spark
query and DuckDB oracle side by side at an arbitrary sf dir (the
driver only checks sf0.01; this catches float-determinism or
data-regime surprises at other scales — round-3 protocol: every new
gate must pass here at sf0.1 too).

Usage: python scripts/sweep_parity.py [sf_dir] [only_query_prefix...]
"""

from __future__ import annotations

import glob
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vhash(df) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()[:12]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    import duckdb

    import __spark_entry__ as e
    from howard_spark.session import get_spark

    spark = get_spark(app="parity-sweep", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in glob.glob(sf + "/*.parquet"):
        name = t.split("/")[-1].removesuffix(".parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

    from howard_spark.operators import load_extras

    qs, os_ = e.queries(), e.oracle_sql()
    ex_q, ex_o = load_extras()
    qs, os_ = {**qs, **ex_q}, {**os_, **ex_o}
    bad = []
    for k in sorted(qs):
        if k not in os_:
            continue
        if only and not any(k.startswith(p) for p in only):
            continue
        try:
            sdf = qs[k](spark, sf).toPandas()
            odf = con.sql(os_[k]).df()
            ok = len(sdf) == len(odf) and vhash(sdf) == vhash(odf)
        except Exception as ex:  # noqa: BLE001 - report, keep sweeping
            print(f"ERR  {k}: {ex!r}"[:200], flush=True)
            bad.append(k)
            continue
        print(("OK   " if ok else "BAD  ") + f"{k} ({len(sdf)} rows)",
              flush=True)
        if not ok:
            bad.append(k)
    print(f"SUMMARY: {len(bad)} failures" + (f" -> {bad}" if bad else ""))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
