#!/usr/bin/env python3
"""Encode/decode throughput at the x10 corpus regime (r4 verdict #2).

2.4M corpus rows (~13 GB raw) — 10x the big-regime row count — staged
to parquet once (generation untimed), then:

- ENCODE: parquet scan -> repartitionByRange(repo, path) ->
  mapInArrow codec kernel -> size agg (the big_regime.md protocol, so
  rows are comparable);
- DECODE: the encoded chunk table staged to parquet, then
  groupBy(part_id, chunk_id) + applyInArrow rebuild -> content-length
  agg (forces full string decode; sha-verify is covered by the test
  suite, here we time the data path).

Run at two parallelism levels to expose the host's bandwidth envelope
(CLAUDE.md: aggregate copy bandwidth saturates ~5.6 GB/s; kernels
measured 0.72 GB/s/core single-core steady state in round 5 — 8+
cores are envelope-bound, not kernel-bound).

Usage: python scripts/encode_xl_bench.py [n_rows] [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
LEVELS = [int(x) for x in sys.argv[2:]] or [8, 32]

WORKER = """
import json, os, sys, time
from howard_spark.session import get_spark
from howard_spark.encode import encode_df, decode_df
from pyspark.sql import functions as F

cores = int(sys.argv[1]); src = sys.argv[2]; enc_dir = sys.argv[3]
spark = get_spark(app=f"xl-{cores}", cores=cores,
                  shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(src)
schema = corpus.schema
# warm-up (python workers, JIT)
encode_df(corpus.limit(2000), npartitions=cores).agg(F.sum("enc_bytes")).collect()

best = None
for _ in range(2):
    t0 = time.time()
    enc = encode_df(corpus, partition_by=["repo", "path"],
                    npartitions=cores * 2)
    stats = enc.agg(F.sum("raw_bytes").alias("r"),
                    F.sum("enc_bytes").alias("e")).first()
    dt = time.time() - t0
    if best is None or dt < best:
        best = dt
enc_gbps = stats["r"] / best / 1e9

# stage encoded table once (untimed), then time decode from disk
if not os.path.exists(enc_dir):
    (encode_df(corpus, partition_by=["repo", "path"], npartitions=cores * 2)
     .write.mode("overwrite").parquet(enc_dir))
enc_stored = spark.read.parquet(enc_dir)
dbest = None
for _ in range(2):
    t0 = time.time()
    dec = decode_df(enc_stored, schema)
    out = dec.agg(F.sum(F.length("content")).alias("b"),
                  F.count("*").alias("n")).first()
    dt = time.time() - t0
    if dbest is None or dt < dbest:
        dbest = dt
assert out["n"] == corpus.count(), (out["n"],)
dec_gbps = stats["r"] / dbest / 1e9
print(json.dumps({"cores": cores, "encode_sec": round(best, 2),
                  "encode_gbps": round(enc_gbps, 3),
                  "decode_sec": round(dbest, 2),
                  "decode_gbps": round(dec_gbps, 3),
                  "raw_bytes": stats["r"], "enc_bytes": stats["e"],
                  "ratio": round(stats["r"] / stats["e"], 2)}))
spark.stop()
"""


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from bench import copy_probe_gbps, wait_for_healthy_probe

    import tempfile

    from howard_spark.corpus import corpus_df
    from howard_spark.session import get_spark

    stage = os.environ.get("XL_STAGE_DIR") or tempfile.mkdtemp(
        prefix="xl_corpus_")
    src = f"{stage}/corpus.parquet"
    if not os.path.exists(src):
        log(f"staging {N_ROWS} corpus rows to {src} (untimed)")
        spark = get_spark(app="xl-stage", cores=32)
        spark.sparkContext.setLogLevel("ERROR")
        corpus_df(spark, N_ROWS, npartitions=128).write.mode(
            "overwrite").parquet(src)
        spark.stop()
    else:
        log(f"reusing staged corpus at {src}")

    def agg_envelope() -> float:
        """8-proc aggregate copy bandwidth (scaling_bench's envelope
        gate): the single-proc probe misses aggregate degradation,
        which is exactly what starves a 13 GB multi-core encode."""
        from scripts.scaling_bench import BW_PROBE  # noqa: F401
        out = subprocess.run([sys.executable, "-c", BW_PROBE],
                             capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().split("\n")[-1])["8"]

    rows = []
    env = dict(os.environ, HS_DRIVER_MEM="48g")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    for cores in LEVELS:
        probe_pre = wait_for_healthy_probe()
        for _w in range(8):
            agg = agg_envelope()
            if agg >= 3.5:
                break
            log(f"  aggregate envelope degraded ({agg} GB/s at 8 procs) "
                f"— waiting 90s")
            time.sleep(90)
        enc_dir = f"{stage}/encoded_{cores}"
        for _try in range(3):
            out = subprocess.run(
                [sys.executable, "-c", WORKER, str(cores), src, enc_dir],
                capture_output=True, text=True, check=True, cwd=repo, env=env)
            r = json.loads(out.stdout.strip().split("\n")[-1])
            r["probe_pre"] = probe_pre
            r["probe_post"] = copy_probe_gbps()
            r["agg8_pre"] = agg
            r["agg8_post"] = agg_envelope()
            # the window must hold THROUGH the run (r5 lesson: a 62 s
            # local[32] encode recorded between two healthy probes was
            # a 6x mid-run flap artifact) — retry on post decay of
            # either the single-proc probe or the aggregate envelope
            if r["probe_post"] >= 1.4 and r["agg8_post"] >= 3.5:
                break
            log(f"  local[{cores}] window decayed (post "
                f"{r['probe_post']}) — retrying")
            probe_pre = wait_for_healthy_probe()
        rows.append(r)
        log(f"  local[{cores}]: {r}")

    md = os.path.join(repo, "BENCH", "big_regime.md")
    with open(md, "a") as fh:
        fh.write(f"\n## encode/decode throughput, x10 corpus "
                 f"({N_ROWS} rows, {rows[0]['raw_bytes'] / 1e9:.1f} GB raw, "
                 f"ratio {rows[0]['ratio']}x)\n\n")
        fh.write("| cores | encode sec | encode GB/s | decode sec | "
                 "decode GB/s | probes |\n|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| local[{r['cores']}] | {r['encode_sec']} | "
                     f"{r['encode_gbps']} | {r['decode_sec']} | "
                     f"{r['decode_gbps']} | {r['probe_pre']}/{r['probe_post']} |\n")
    print(json.dumps({"metric": "xl encode/decode", "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
