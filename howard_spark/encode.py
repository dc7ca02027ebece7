"""Distributed encode/decode: the codec layer lifted onto Spark.

Encode is a single ``mapInArrow`` stage over a (range-)repartitioned
DataFrame — each task turns its partition into per-column-chunk
encoded rows. Decode is ``applyInArrow`` grouped by (part_id,
chunk_id). No per-row Python anywhere: kernels see Arrow batches and
call the vectorized codec library.

Scale design notes (100 TB / 1000 executors):
- `repartitionByRange(keys)` gives each task a contiguous key range,
  which is what makes RLE/dict local and is the analog of the
  reference's hive partitioning by #CHROM
  (/root/reference/docs/tips.md:5-28). A mega-repo is split across
  ranges by `path`, so repo-level skew is handled by the range
  partitioner itself; `salt()` below covers single-key hot spots.
- The encoded table is columnar-over-columns: one row per
  (column, chunk). Reading a column subset prunes both the scan
  (predicate on `column` pushes into Parquet) and the decode shuffle.
- Decode's groupBy shuffles only the selected columns' payloads; when
  the encoded table is persisted bucketed by part_id the shuffle
  disappears entirely (bucketed scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .codecs import decode_array, encode_array

DEFAULT_CHUNK_ROWS = 65536  # codec unit; analog of reference ROW_GROUP_SIZE
                            # (/root/reference/howard/functions/databases.py:1406)
DEFAULT_CHUNK_BYTES = 32 << 20  # flush early on wide rows: bounds the byte-block
                                # size a codec sees and the kernel's memory

ENCODED_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("chunk_id", IntegerType(), False),
        StructField("row_start", LongType(), False),
        StructField("column", StringType(), False),
        StructField("codec", StringType(), False),
        StructField("n_rows", LongType(), False),
        StructField("n_nulls", LongType(), False),
        StructField("raw_bytes", LongType(), False),
        StructField("enc_bytes", LongType(), False),
        StructField("sha", StringType(), False),
        StructField("vmin", StringType(), True),
        StructField("vmax", StringType(), True),
        StructField("meta", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

_ENC_ARROW = pa.schema(
    [
        ("part_id", pa.int32()),
        ("chunk_id", pa.int32()),
        ("row_start", pa.int64()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("sha", pa.string()),
        ("vmin", pa.string()),
        ("vmax", pa.string()),
        ("meta", pa.string()),
        ("payload", pa.binary()),
    ]
)


PROBE_EVERY = 8  # re-run full codec selection every Nth chunk per column


def encode_chunk(tbl: pa.Table, part_id: int, chunk_id: int, row_start: int,
                 memo: dict | None = None) -> pa.RecordBatch:
    """Encode one row-chunk of a table → one encoded row per column.

    ``memo`` is the adaptive selector state: per column, the previous
    chunk's string-codec choice is trusted (skipping candidate trials,
    incl. the FSST sample training) and re-probed every PROBE_EVERY
    chunks — the steady-state amortization analog of the reference's
    skip-if-already-annotated check (SURVEY.md §4 X9)."""
    rows = {k: [] for k in _ENC_ARROW.names}
    for col in tbl.column_names:
        hint = None
        if memo is not None:
            prev, age = memo.get(col, (None, 0))
            if prev is not None and age < PROBE_EVERY:
                hint = prev
        enc = encode_array(tbl[col], hint=hint)
        if memo is not None:
            import json as _json

            m = _json.loads(enc.meta)
            if m["c"] in ("sraw", "sdict"):
                new_hint = {"c": m["c"], "b": m["m"].get("b", "zlib")}
                _, age = memo.get(col, (None, 0))
                memo[col] = (new_hint, 0 if hint is None else age + 1)
            else:
                memo[col] = (None, 0)
        rows["part_id"].append(part_id)
        rows["chunk_id"].append(chunk_id)
        rows["row_start"].append(row_start)
        rows["column"].append(col)
        rows["codec"].append(enc.codec)
        rows["n_rows"].append(enc.n_rows)
        rows["n_nulls"].append(enc.n_nulls)
        rows["raw_bytes"].append(enc.raw_bytes)
        rows["enc_bytes"].append(enc.enc_bytes)
        rows["sha"].append(hashlib.sha256(enc.payload).hexdigest()[:16])
        vmin = vmax = None
        t = tbl[col].type
        if enc.n_rows and not (pa.types.is_list(t) or pa.types.is_large_list(t)
                               or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            import pyarrow.compute as pc

            mm = pc.min_max(tbl[col])
            if mm["min"].is_valid:
                vmin, vmax = str(mm["min"].as_py()), str(mm["max"].as_py())
        rows["vmin"].append(vmin)
        rows["vmax"].append(vmax)
        rows["meta"].append(enc.meta)
        rows["payload"].append(enc.payload)
    return pa.RecordBatch.from_pydict(rows, schema=_ENC_ARROW)


def _encode_kernel(chunk_rows: int, chunk_bytes: int = DEFAULT_CHUNK_BYTES):
    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        buf: list[pa.RecordBatch] = []
        buffered = 0
        buffered_bytes = 0
        chunk_id = 0
        row_start = 0
        memo: dict = {}  # adaptive selector state (per task)
        for b in batches:
            if b.num_rows == 0:
                continue
            buf.append(b)
            buffered += b.num_rows
            buffered_bytes += b.nbytes
            while buffered >= chunk_rows or buffered_bytes >= chunk_bytes:
                tbl = pa.Table.from_batches(buf)
                take = min(chunk_rows, tbl.num_rows)
                chunk = tbl.slice(0, take)
                rest = tbl.slice(take)
                yield encode_chunk(chunk, pid, chunk_id, row_start, memo)
                chunk_id += 1
                row_start += take
                buf = rest.to_batches() if rest.num_rows else []
                buffered = rest.num_rows
                buffered_bytes = rest.nbytes if rest.num_rows else 0
                if buffered < chunk_rows and buffered_bytes < chunk_bytes:
                    break
        if buffered:
            tbl = pa.Table.from_batches(buf)
            yield encode_chunk(tbl, pid, chunk_id, row_start, memo)

    return kernel


def salt(df: DataFrame, key: str, buckets: int, salt_col: str = "__salt",
         within: list[str] | None = None, mode: str = "content") -> DataFrame:
    """Explicit skew salting: spread a hot key across ``buckets`` splits.

    Salting happens *within* the key so range locality survives —
    append ``salt_col`` last in the partitioning keys.

    ``mode="content"`` (default): salt is a DETERMINISTIC pure function
    of row content (xxhash64 of ``key`` plus ``within`` tiebreaker
    columns, default: all other columns) — partition membership is
    stable across runs/retries and the checkpoint
    byte-identical-resume invariant holds. LIMITATION: duplicate rows
    (or a hot key whose non-key columns are low-cardinality) hash to
    the same bucket, so content salting cannot spread duplicate-heavy
    hot keys.

    ``mode="spread"``: salt additionally mixes in the physical row
    position (spark_partition_id + monotonically_increasing_id), so
    byte-identical duplicate rows DO spread uniformly. The placement
    is deterministic only for a fixed input partitioning — do NOT use
    it where byte-identical resume matters (checkpoint.py).
    """
    tiebreak = within if within is not None else [c for c in df.columns if c != key]
    cols = [F.col(key), *[F.col(c) for c in tiebreak]]
    if mode == "spread":
        cols += [F.spark_partition_id(), F.monotonically_increasing_id()]
    elif mode != "content":
        raise ValueError(f"unknown salt mode {mode!r}")
    h = F.xxhash64(*cols)
    return df.withColumn(salt_col, F.pmod(h, F.lit(buckets)).cast("int"))


def encode_df(
    df: DataFrame,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    partition_by: list[str] | None = None,
    npartitions: int | None = None,
    sort_within: bool = False,
) -> DataFrame:
    """Encode a DataFrame into per-column-chunk rows (lazy).

    ``partition_by`` range-partitions for codec locality — e.g.
    ``["repo", "path"]`` for the source-code corpus. Range partitioning
    alone delivers the clustering the codecs need: measured on the
    240k-row corpus, a full ``sortWithinPartitions`` costs as much
    wall-time as the encode kernels and changes the encoded size by
    <1% (zstd's window absorbs local ordering; dict codecs are
    order-free). ``sort_within=True`` restores the full sort for
    callers that need deterministic chunk contents — checkpointed
    encode (checkpoint.py) does its own repartition+sort for the
    byte-identical-resume invariant and is unaffected by this default.
    """
    if partition_by:
        n = npartitions or df.sparkSession.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, *[F.col(c) for c in partition_by])
        if sort_within:
            df = df.sortWithinPartitions(*partition_by)
    return df.mapInArrow(_encode_kernel(chunk_rows), ENCODED_SCHEMA)


def _decode_kernel(fields: list[tuple[str, object]]):
    names = [f[0] for f in fields]

    def kernel(tbl: pa.Table) -> pa.Table:
        cols = tbl.column("column").to_pylist()
        metas = tbl.column("meta").to_pylist()
        payloads = tbl.column("payload").to_pylist()
        nrows = tbl.column("n_rows").to_pylist()
        by_name = {}
        for c, m, p, n in zip(cols, metas, payloads, nrows):
            by_name[c] = decode_array(p, m, n)
        arrays = [by_name[n] for n in names]
        return pa.Table.from_arrays(arrays, names=names)

    return kernel


def decode_df(enc: DataFrame, schema: StructType, columns: list[str] | None = None,
              group_extra: list[str] | None = None) -> DataFrame:
    """Decode encoded chunk rows back to the original relation (lazy).

    ``columns`` prunes before the shuffle: only the requested payloads
    move. The per-chunk group is self-contained, so the rebuild is one
    ``applyInArrow`` with no further exchange.

    ``group_extra``: additional chunk-identity columns when several
    encoded stores are unioned (e.g. the streaming store's ``__batch``)
    — (part_id, chunk_id) alone collides across stores.
    """
    if columns:
        fields = [f for f in schema.fields if f.name in columns]
        enc = enc.filter(F.col("column").isin(list(columns)))
    else:
        fields = list(schema.fields)
    out_schema = StructType(fields)
    kernel = _decode_kernel([(f.name, f.dataType) for f in fields])
    keys = ["part_id", "chunk_id", *(group_extra or [])]
    return enc.groupBy(*keys).applyInArrow(kernel, out_schema)


def prune_chunks(enc: DataFrame, column: str, lo=None, hi=None,
                 dtype: str | None = None) -> DataFrame:
    """Data skipping on per-chunk min/max stats (the Spark analog of the
    reference's (#CHROM,POS,REF,ALT) indexes, SURVEY.md §4 X6, and of
    Parquet footer stats).

    Keeps only the chunks whose [vmin, vmax] for ``column`` intersects
    [lo, hi] — ALL columns of surviving chunks are kept so the result
    still decodes. The semi-join key set is tiny (part_id, chunk_id),
    and the stats filter pushes into the encoded table's scan; pruned
    payloads are never read past the footer at scale.

    The predicate remains a *superset* filter: re-apply the row-level
    filter after decode for exact semantics.
    """
    stats = enc.where(F.col("column") == column)
    if dtype:
        vmin = F.col("vmin").cast(dtype)
        vmax = F.col("vmax").cast(dtype)
        lo_c = F.lit(lo).cast(dtype) if lo is not None else None
        hi_c = F.lit(hi).cast(dtype) if hi is not None else None
    else:
        vmin, vmax = F.col("vmin"), F.col("vmax")
        lo_c = F.lit(lo) if lo is not None else None
        hi_c = F.lit(hi) if hi is not None else None
    cond = F.lit(True)
    if hi is not None:
        cond = cond & (vmin <= hi_c)
    if lo is not None:
        cond = cond & (vmax >= lo_c)
    # Chunks with no stats (binary/list columns, all-null chunks) have
    # NULL vmin/vmax — they MUST survive, or the "superset" promise
    # silently becomes an empty result.
    cond = cond | F.col("vmin").isNull() | F.col("vmax").isNull()
    keep = stats.where(cond).select("part_id", "chunk_id").distinct()
    return enc.join(F.broadcast(keep), ["part_id", "chunk_id"], "left_semi")


def save_encoded_table(enc: DataFrame, name: str, buckets: int = 64) -> None:
    """Persist encoded chunk rows BUCKETED by (part_id, chunk_id).

    This is the at-scale layout: ``decode_df`` groups on exactly those
    keys, so a bucketed scan already satisfies the required clustering
    and the decode plan contains NO Exchange — reading N TB of encoded
    data back never shuffles payloads (asserted in
    tests/test_encode_spark.py::test_bucketed_decode_no_shuffle)."""
    (enc.write.mode("overwrite")
        .bucketBy(buckets, "part_id", "chunk_id")
        .sortBy("part_id", "chunk_id")
        .saveAsTable(name))


def decode_table(spark, name: str, schema: StructType,
                 columns: list[str] | None = None) -> DataFrame:
    """Shuffle-free decode of a bucketed encoded table."""
    return decode_df(spark.table(name), schema, columns=columns)


def encoded_summary(enc: DataFrame) -> DataFrame:
    """Codec-choice + size metrics per column (lineage/observability)."""
    return (
        enc.groupBy("column", "codec")
        .agg(
            F.count("*").alias("chunks"),
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .withColumn("ratio", F.round(F.col("raw_bytes") / F.col("enc_bytes"), 2))
        .orderBy("column", "codec")
    )


def verify_roundtrip(df: DataFrame, dec: DataFrame, text_cols: list[str]) -> int:
    """North-rule invariant: sha256 equality per row on content columns.

    Returns the number of mismatched rows (0 == bit-identical).
    Implemented as a full-outer multiset compare of per-row sha256
    signatures — no join keys needed, robust to row order.
    """
    def sig(d: DataFrame) -> DataFrame:
        cols = [F.sha2(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")), 256) for c in text_cols]
        return d.select(F.sha2(F.concat_ws("|", *cols), 256).alias("h")).groupBy("h").agg(
            F.count("*").alias("cnt")
        )

    a, b = sig(df), sig(dec)
    diff = a.join(b, "h", "full_outer").where(
        F.coalesce(a["cnt"], F.lit(0)) != F.coalesce(b["cnt"], F.lit(0))
    )
    return diff.count()
