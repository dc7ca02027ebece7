#!/usr/bin/env python3
"""Scaling-efficiency evidence: the same encode job at two parallelism
levels (local[N] vs local[4N]) on the same input.

The north rule's two-cluster-size criterion can't use a real cluster in
this sandbox; per driver instructions the proxy is CPU-parallelism
scaling of the identical job. Keeps the job CPU-bound (vectorized
encode) so the measurement is honest. Writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [n_rows] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

WORKER = """
import json, sys, time
from howard_spark.session import get_spark
from howard_spark.corpus import corpus_df
from howard_spark.encode import encode_df
from pyspark.sql import functions as F

cores = int(sys.argv[1]); n_rows = int(sys.argv[2])
spark = get_spark(app=f"scale-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
corpus = corpus_df(spark, n_rows, npartitions=cores * 2).cache()
corpus.count()  # materialize input before timing
t0 = time.time()
enc = encode_df(corpus, partition_by=["repo", "path"], npartitions=cores * 2)
stats = enc.agg(F.sum("raw_bytes").alias("r"), F.sum("enc_bytes").alias("e")).collect()[0]
dt = time.time() - t0
print(json.dumps({"cores": cores, "wall_sec": dt, "raw_bytes": stats["r"],
                  "enc_bytes": stats["e"], "gbps": stats["r"] / dt / 1e9}))
spark.stop()
"""


def run(cores: int, n_rows: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), str(n_rows)],
        capture_output=True, text=True, check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = out.stdout.strip().split("\n")[-1]
    return json.loads(line)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = run(n, n_rows)
    hi = run(4 * n, n_rows)
    eff = (hi["gbps"] / lo["gbps"]) / 4.0
    result = {"N": n, "4N": 4 * n, "rows": n_rows, "low": lo, "high": hi,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result, indent=2))

    md = f"""# BENCH — measured numbers (local sandbox)

## Scaling efficiency (north-rule N -> 4N criterion, CPU-parallelism proxy)

Same encode job (deterministic corpus, {n_rows:,} rows,
`encode_df(partition_by=["repo","path"])`), identical input, two
parallelism levels. Input materialized (cached + counted) before the
timed region; the timed region is the encode stage + size aggregation.

| cores | wall (s) | raw bytes | encoded bytes | throughput (GB/s) |
|---|---|---|---|---|
| local[{n}] | {lo['wall_sec']:.2f} | {lo['raw_bytes']:,} | {lo['enc_bytes']:,} | {lo['gbps']:.3f} |
| local[{4*n}] | {hi['wall_sec']:.2f} | {hi['raw_bytes']:,} | {hi['enc_bytes']:,} | {hi['gbps']:.3f} |

**Scaling efficiency** = (throughput_{4*n} / throughput_{n}) / 4 =
**{eff:.3f}** (requirement: >= 0.8).

Compression ratio vs raw logical bytes: {lo['raw_bytes']/lo['enc_bytes']:.2f}x.
(Encoded-vs-Parquet bound is asserted per-table in
tests/test_encode_spark.py::test_size_bound_vs_parquet.)

Methodology notes
- local[N] vs local[4N] measures CPU scaling only (single JVM, shared
  memory); the encode kernel is CPU-bound vectorized numpy/Arrow, so
  task-level parallel efficiency is the honest signal available in this
  sandbox (no multi-node cluster).
- Determinism: corpus is a pure function of (seed, row id); the encode
  partitioning is `repartitionByRange` over (repo, path).
"""
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "BENCH"), exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "BASELINE.md")
    with open(out_path, "w") as fh:
        fh.write(md)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
