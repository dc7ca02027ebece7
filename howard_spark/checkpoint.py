"""Checkpointed encode with per-partition lineage + resume.

The Spark analog of the reference's skip-if-already-annotated
incremental logic (/root/reference/howard/objects/variants.py:6123-6130,
SURVEY.md §4 X9): every logical partition commits its encoded output
atomically (tmp file + rename) together with a manifest row; a re-run
skips committed partitions and produces byte-identical output.

Determinism is explicit, not left to Spark's RangePartitioner:
partition boundaries are computed once on the driver from a seeded
sample of the sort key, rows are assigned by vectorized
``searchsorted`` (Arrow UDF), and rows are sorted within each
partition by the full key — so partition membership, row order, chunk
boundaries, and therefore output bytes are a pure function of the
input. On a real cluster ``out_dir`` is a shared filesystem (S3/HDFS);
the tmp-rename commit is the same pattern Spark's own
FileOutputCommitter v2 uses.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from .encode import DEFAULT_CHUNK_ROWS, _ENC_ARROW, encode_chunk

SEP = "\x00"


def _key_expr(keys: list[str]):
    return F.concat_ws(SEP, *[F.col(k).cast("string") for k in keys])


def compute_boundaries(df: DataFrame, keys: list[str], npartitions: int,
                       max_sample: int = 200_000) -> list[str]:
    """Driver-side deterministic range boundaries from a seeded sample."""
    kdf = df.select(_key_expr(keys).alias("k"))
    n = kdf.count()
    if n == 0 or npartitions <= 1:
        return []
    if n > max_sample:
        kdf = kdf.sample(fraction=max_sample / n, seed=42)
    ks = sorted(r["k"] for r in kdf.collect())
    if not ks:
        return []
    bounds = []
    for i in range(1, npartitions):
        bounds.append(ks[min(len(ks) - 1, (i * len(ks)) // npartitions)])
    return sorted(set(bounds))


def assign_partitions(df: DataFrame, keys: list[str], boundaries: list[str]) -> DataFrame:
    """Vectorized part-id assignment: searchsorted against boundaries."""
    spark = df.sparkSession
    b_bc = spark.sparkContext.broadcast(np.array(boundaries, dtype=object))

    @F.pandas_udf(IntegerType())
    def part_of(k):
        b = b_bc.value
        if b.size == 0:
            return k.map(lambda _: 0).astype("int32")
        import pandas as pd
        idx = np.searchsorted(b, k.to_numpy(dtype=object), side="right")
        return pd.Series(idx.astype("int32"))

    return df.withColumn("__part", part_of(_key_expr(keys)))


def _scan_manifests(out_dir: str) -> dict[int, dict]:
    mdir = os.path.join(out_dir, "_manifest")
    done = {}
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if f.startswith("part-") and f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    m = json.load(fh)
                data_file = os.path.join(out_dir, "data", f"part-{m['part_id']:05d}.parquet")
                if os.path.isfile(data_file):
                    done[m["part_id"]] = m
    return done


def encode_to_dir(
    df: DataFrame,
    out_dir: str,
    keys: list[str],
    npartitions: int | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    resume: bool = True,
    fail_on_parts: set[int] | None = None,
) -> dict:
    """Encode ``df`` to ``out_dir`` with per-partition commit + resume.

    Returns job-level metrics. ``fail_on_parts`` injects a failure when
    a listed partition would commit (FIXTURES.md F4 test hook).
    """
    spark = df.sparkSession
    if npartitions is None:
        npartitions = spark.sparkContext.defaultParallelism

    os.makedirs(os.path.join(out_dir, "data"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    boundaries = compute_boundaries(df, keys, npartitions)
    with open(os.path.join(out_dir, "_plan.json"), "w") as fh:
        json.dump({"keys": keys, "npartitions": npartitions,
                   "chunk_rows": chunk_rows, "boundaries": boundaries}, fh)

    done = _scan_manifests(out_dir) if resume else {}
    done_bc = spark.sparkContext.broadcast(set(done))
    fail_bc = spark.sparkContext.broadcast(fail_on_parts or set())

    work = assign_partitions(df, keys, boundaries)
    # Byte-identical resume needs a deterministic TOTAL order inside each
    # partition. (__part, keys) alone ties on duplicate keys (same
    # (repo,path) at different commits) and Spark's sort is not stable
    # across shuffle-fetch orders — so break ties with a full-row
    # xxhash64. Identical rows hash equal (interchangeable); two
    # DISTINCT tied rows could still collide on the 64-bit hash and
    # order nondeterministically, so the guarantee is collision-
    # probabilistic (~2^-64 per tied pair), not absolute.
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    work = (
        work.repartition(npartitions, "__part")
        .sortWithinPartitions(F.col("__part"), *[F.col(k) for k in keys], tiebreak)
    )

    data_cols = [f.name for f in df.schema.fields]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bufs: dict[int, list[pa.Table]] = {}
        enc_rows: dict[int, list[pa.RecordBatch]] = {}
        counters: dict[int, dict] = {}
        # selector memo is scoped PER PART: resume re-encodes whole parts,
        # so per-part state keeps output bytes a pure function of the part
        memos: dict[int, dict] = {}

        def flush_chunks(pid: int, final: bool):
            tbls = bufs.get(pid)
            if not tbls:
                return
            tbl = pa.concat_tables(tbls)
            cnt = counters.setdefault(
                pid, {"chunk_id": 0, "row_start": 0, "t0": time.time()}
            )

            def emit(take: int):
                nonlocal tbl
                enc_rows.setdefault(pid, []).append(
                    encode_chunk(tbl.slice(0, take), pid, cnt["chunk_id"],
                                 cnt["row_start"], memos.setdefault(pid, {}))
                )
                cnt["chunk_id"] += 1
                cnt["row_start"] += take
                tbl = tbl.slice(take)

            while tbl.num_rows >= chunk_rows:
                emit(chunk_rows)
            if final and tbl.num_rows:
                emit(tbl.num_rows)
            bufs[pid] = [tbl] if tbl.num_rows else []

        def commit(pid: int):
            if pid in fail_bc.value:
                raise RuntimeError(f"injected failure before committing part {pid}")
            rows = enc_rows.pop(pid, [])
            cnt = counters.pop(pid, {"chunk_id": 0, "row_start": 0, "t0": time.time()})
            out = pa.Table.from_batches(rows, schema=_ENC_ARROW) if rows else \
                _ENC_ARROW.empty_table()
            data_path = os.path.join(out_dir, "data", f"part-{pid:05d}.parquet")
            tmp = data_path + f".tmp-{os.getpid()}"
            pq.write_table(out, tmp, compression="none")
            os.replace(tmp, data_path)
            manifest = {
                "part_id": pid,
                "n_rows": int(cnt["row_start"]),
                "n_chunks": int(cnt["chunk_id"]),
                "raw_bytes": int(sum(out.column("raw_bytes").to_pylist() or [0])),
                "enc_bytes": int(sum(out.column("enc_bytes").to_pylist() or [0])),
                "codecs": dict(
                    zip(*np.unique(out.column("codec").to_pylist() or ["-"],
                                   return_counts=True))
                ) if out.num_rows else {},
                "chunk_shas": out.column("sha").to_pylist(),
                "wall_ms": int((time.time() - cnt["t0"]) * 1000),
            }
            manifest["codecs"] = {k: int(v) for k, v in manifest["codecs"].items()}
            mpath = os.path.join(out_dir, "_manifest", f"part-{pid:05d}.json")
            mtmp = mpath + f".tmp-{os.getpid()}"
            with open(mtmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(mtmp, mpath)
            yield pa.RecordBatch.from_pydict(
                {"part_id": [pid], "n_rows": [manifest["n_rows"]],
                 "enc_bytes": [manifest["enc_bytes"]],
                 "raw_bytes": [manifest["raw_bytes"]], "skipped": [False]}
            )

        current: int | None = None  # rows arrive sorted by (__part, keys)
        for b in batches:
            if b.num_rows == 0:
                continue
            parts = b.column(b.schema.get_field_index("__part")).to_numpy()
            data = pa.Table.from_batches([b]).select(data_cols)
            # segment the batch by part id (sorted within partition)
            change = np.flatnonzero(np.diff(parts)) + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [parts.size]])
            for s, e in zip(starts, ends):
                pid = int(parts[s])
                if pid != current:
                    if current is not None and current not in done_bc.value:
                        flush_chunks(current, final=True)
                        yield from commit(current)
                    current = pid
                if pid in done_bc.value:
                    continue
                bufs.setdefault(pid, []).append(data.slice(s, e - s))
                flush_chunks(pid, final=False)
        if current is not None and current not in done_bc.value:
            flush_chunks(current, final=True)
            yield from commit(current)

    from pyspark.sql.types import BooleanType, LongType, StructField, StructType
    metrics_schema = StructType([
        StructField("part_id", LongType()), StructField("n_rows", LongType()),
        StructField("enc_bytes", LongType()), StructField("raw_bytes", LongType()),
        StructField("skipped", BooleanType()),
    ])
    t0 = time.time()
    metrics = work.mapInArrow(kernel, metrics_schema).collect()
    wall = time.time() - t0

    all_manifests = _scan_manifests(out_dir)
    return {
        "wall_sec": wall,
        "parts_total": len(all_manifests),
        "parts_encoded_this_run": len(metrics),
        "parts_skipped": len(done),
        "rows": sum(m["n_rows"] for m in all_manifests.values()),
        "raw_bytes": sum(m["raw_bytes"] for m in all_manifests.values()),
        "enc_bytes": sum(m["enc_bytes"] for m in all_manifests.values()),
    }


def read_encoded(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))


def verify_store(spark, out_dir: str) -> dict:
    """Scrub an encoded store against its lineage (the maintenance job
    a 100-TB archive runs periodically):

    1. payload integrity — recompute sha256(payload) for EVERY chunk
       row JVM-side (``sha2`` native expression, no Python) and compare
       to the sha recorded at encode time: catches bit rot / partial
       writes inside payloads;
    2. manifest consistency — per part, the multiset of chunk shas in
       the data files must equal the manifest's ``chunk_shas``: catches
       lost, truncated, duplicated, or orphaned chunk rows.

    Returns {'parts', 'chunks', 'payload_mismatches',
    'manifest_mismatches': [part_id...], 'ok'}. Only per-part digest
    strings reach the driver."""
    import hashlib as _hl

    enc = read_encoded(spark, out_dir)
    bad_payload = (
        enc.select(
            F.when(F.substring(F.sha2("payload", 256), 1, 16) != F.col("sha"), 1)
            .otherwise(0).alias("bad"))
        .agg(F.sum("bad").alias("n")).first()["n"]
    )
    actual = {
        r["part_id"]: r["digest"]
        for r in enc.groupBy("part_id")
        .agg(F.sha2(F.concat_ws("|", F.array_sort(F.collect_list("sha"))), 256)
             .alias("digest"))
        .collect()
    }
    manifests = _scan_manifests(out_dir)
    expected = {
        pid: _hl.sha256("|".join(sorted(m["chunk_shas"])).encode()).hexdigest()
        for pid, m in manifests.items()
    }
    mismatched = sorted(
        set(pid for pid in expected if actual.get(pid) != expected[pid])
        | set(actual) - set(expected)
    )
    n_chunks = enc.count()
    return {
        "parts": len(manifests),
        "chunks": n_chunks,
        "payload_mismatches": int(bad_payload or 0),
        "manifest_mismatches": mismatched,
        "ok": not bad_payload and not mismatched,
    }
