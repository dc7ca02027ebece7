"""Correctness-gate queries that exercise the encode engine itself.

q50 runs documents through the full distributed pipeline —
encode_df (mapInArrow, codec auto-selection) → decode_df
(applyInArrow) — and emits per-row sha256 of the decoded text. The
DuckDB oracle hashes the *source* rows, so a single mismatched bit
anywhere in the codec stack fails the driver's value-hash compare.
This is the north rule's per-row invariant as a gate query.

q51/q52 surface codec-choice and compression metrics (rows-only).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import query, t
from ..encode import decode_df, encode_df, encoded_summary


def _scan_parallel(df):
    """Round-robin a narrow scan up to the core count before the
    mapInArrow encode kernel (guide §6: these tables arrive as a single
    small parquet file = 1-3 input splits, so the encode stage would
    otherwise run on 1-3 cores; measured q51 2.55 -> 1.82 s at sf0.1,
    and the gap grows with SF). Skipped when the scan is already wide —
    at cluster scale the input has hundreds of splits and this is a
    no-op, so the repartition never shows up where it wouldn't help.
    Decoded ROW SETS are chunking-independent, so gate outputs are
    unchanged (oracle hash parity covers this)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)


@query(
    "q50_encode_roundtrip_sha",
    """
    SELECT doc_id, sha256(text) AS sha, lang AS lang
    FROM documents
    """,
)
def q50(spark, sf):
    d = t(spark, sf, "documents")
    enc = encode_df(_scan_parallel(d), chunk_rows=4096)
    dec = decode_df(enc, d.schema, columns=["doc_id", "text", "lang"])
    return dec.select("doc_id", F.sha2("text", 256).alias("sha"), F.col("lang").alias("lang"))


@query(
    "q51_encode_roundtrip_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(DISTINCT md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                              CAST(l_linenumber AS VARCHAR))) AS n_keys
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q51(spark, sf):
    """Round-trip a *numeric-heavy* table through the codecs, then
    aggregate the decoded relation — proves floats/timestamps survive
    (fdec/FoR paths), not just strings."""
    li = t(spark, sf, "lineitem")
    enc = encode_df(_scan_parallel(li), chunk_rows=16384)
    dec = decode_df(enc, li.schema)
    rid = F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber"))
    return (
        dec.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.countDistinct(rid).alias("n_keys"),
        )
    )


@query("q52_codec_metrics", driver=False)  # rows-only: engine-internal observability; covered by pytest codec-selection tests
def q52(spark, sf):
    d = t(spark, sf, "documents")
    return encoded_summary(encode_df(d, chunk_rows=4096))
