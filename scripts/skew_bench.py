#!/usr/bin/env python3
"""Skew proof for encode (r4 verdict #5): a planted mega-key straggler
collapses under salt(mode="spread").

CLAUDE.md documents the salting design but no measured planted-mega-key
run existed. This script plants the harshest skew the range partitioner
cannot fix on its own — ONE (repo, path) key holding ~50% of all rows
(range partitioning by (repo, path) puts the whole key in one
partition, so one core encodes half the corpus while the rest idle) —
and measures encode wall at local[8] with and without the salt column
appended to the partition keys.

mode="spread" is required here: the planted rows share the hot KEY but
have distinct content, so content-mode would also work; spread-mode is
what handles the fully-degenerate duplicate-row case too, and this run
is the measured evidence for the docstring's claim.

Appends a row to BENCH/big_regime.md and prints one JSON line.

Usage: python scripts/skew_bench.py [n_rows] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from bench import copy_probe_gbps, wait_for_healthy_probe

    probe_pre = wait_for_healthy_probe()
    log(f"probe pre: {probe_pre} GB/s")

    from pyspark.sql import functions as F

    from howard_spark.corpus import corpus_df
    from howard_spark.encode import encode_df, salt
    from howard_spark.session import get_spark

    spark = get_spark(app="howard_spark-skew", cores=CORES,
                      shuffle_partitions=max(CORES, 8))
    spark.sparkContext.setLogLevel("ERROR")

    base = corpus_df(spark, N_ROWS, npartitions=CORES * 2)
    # plant: every even row belongs to ONE (repo, path) key
    hot = F.xxhash64("content") % 2 == 0
    skewed = base.select(
        F.when(hot, F.lit("megarepo")).otherwise(F.col("repo")).alias("repo"),
        F.when(hot, F.lit("src/hot.py")).otherwise(F.col("path")).alias("path"),
        "commit", "lang", "content", "size_bytes", "line_count", "mtime_epoch",
    ).cache()
    skewed.count()
    # warm-up workers/JIT outside the timed region
    encode_df(skewed.limit(2000), npartitions=CORES).agg(
        F.sum("enc_bytes")).collect()

    def timed(df_enc):
        best = None
        for _ in range(2):
            t0 = time.time()
            stats = df_enc.agg(F.sum("raw_bytes").alias("r"),
                               F.sum("enc_bytes").alias("e")).first()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        # per-partition byte distribution: on a real cluster (per-node
        # bandwidth scales with nodes) the MAX partition's bytes IS the
        # wall; on this bandwidth-saturated single box the wall hides
        # the straggler, so the distribution is the honest evidence
        per_part = [r["b"] for r in df_enc.groupBy("part_id")
                    .agg(F.sum("raw_bytes").alias("b")).collect()]
        total = sum(per_part)
        return best, stats["r"], {
            "parts": len(per_part),
            "max_share": round(max(per_part) / total, 3),
            "ideal_share": round(1 / len(per_part), 3),
        }

    npart = CORES * 2
    plain_enc = encode_df(skewed, partition_by=["repo", "path"],
                          npartitions=npart)
    t_plain, raw, dist_plain = timed(plain_enc)
    log(f"  unsalted: {t_plain:.2f}s ({raw / t_plain / 1e9:.3f} GB/s) {dist_plain}")

    salted = salt(skewed, "path", buckets=CORES, mode="spread")
    salted_enc = encode_df(salted,
                           partition_by=["repo", "path", "__salt"],
                           npartitions=npart)
    t_salt, raw_s, dist_salt = timed(salted_enc)
    log(f"  salted:   {t_salt:.2f}s ({raw_s / t_salt / 1e9:.3f} GB/s) {dist_salt}")

    probe_post = copy_probe_gbps()
    out = {
        "metric": "encode skew proof (planted mega-key, 50% of rows)",
        "rows": N_ROWS, "cores": CORES,
        "unsalted_sec": round(t_plain, 2), "salted_sec": round(t_salt, 2),
        "speedup": round(t_plain / t_salt, 2),
        "unsalted_gbps": round(raw / t_plain / 1e9, 3),
        "salted_gbps": round(raw_s / t_salt / 1e9, 3),
        "unsalted_dist": dist_plain, "salted_dist": dist_salt,
        "probe_pre_gbps": probe_pre, "probe_post_gbps": probe_post,
    }
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "big_regime.md")
    with open(md, "a") as fh:
        fh.write(f"\n## encode skew proof (one (repo,path) key = 50% of rows, "
                 f"{N_ROWS} rows, local[{CORES}], probes "
                 f"{probe_pre}/{probe_post} GB/s)\n\n")
        fh.write("| variant | sec | GB/s | max partition byte-share "
                 "(ideal) |\n|---|---|---|---|\n")
        fh.write(f"| range(repo,path) only | {out['unsalted_sec']} | "
                 f"{out['unsalted_gbps']} | {dist_plain['max_share']} "
                 f"({dist_plain['ideal_share']}) |\n")
        fh.write(f"| + salt(spread, {CORES}) | {out['salted_sec']} | "
                 f"{out['salted_gbps']} | {dist_salt['max_share']} "
                 f"({dist_salt['ideal_share']}) |\n")
        fh.write(f"\nwall ratio: {out['speedup']}x\n")
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
