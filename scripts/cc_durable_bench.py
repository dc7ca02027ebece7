#!/usr/bin/env python3
"""Durable-checkpoint connected components at the big regime (r4
verdict #6): q35's checkpoint_dir mode was only exercised on 200-hop
chain fixtures; this measures it on the real multi-million-edge LSH
candidate graph (docs x10 regime) against the default localCheckpoint
mode — rounds, wall, and the result equality.

When durable mode pays: localCheckpoint pins blocks in executor
storage — an executor loss mid-iteration kills the job (fine on one
box, fatal on preemptible clusters); checkpoint(eager=True) writes
each round's edge set to the (HDFS/object-store) checkpoint dir, so
the iteration survives executor churn at the cost of one write+read
of the edge set per round. The measured delta here IS that cost.

Appends to BENCH/big_regime.md and prints one JSON line.

Usage: python scripts/cc_durable_bench.py [docs_x]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_X = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from bench import copy_probe_gbps, wait_for_healthy_probe

    probe_pre = wait_for_healthy_probe()
    log(f"probe pre: {probe_pre} GB/s")

    from pyspark.sql import functions as F

    from howard_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="howard_spark-ccdurable", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from howard_spark.operators import dedup

    big = tempfile.mkdtemp(prefix=f"cc_durable_x{DOCS_X}_")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(DOCS_X).select(F.col("id").alias("rep"))
    (docs.crossJoin(reps)
     .select(
         (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
         F.when(F.col("rep") == 0, F.col("text"))
         .otherwise(F.concat(F.lit("v"), F.col("rep").cast("string"),
                             F.lit(" "), F.col("text"))).alias("text"),
         "lang", "source", "n_chars")
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{big}/documents.parquet"))

    pairs = dedup.q32(spark, big).persist()
    n_edges = pairs.count()
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    log(f"derived x{DOCS_X} regime: {n_edges} candidate edges")

    results = {}
    for mode, ckpt_dir in (("local", None),
                           ("durable", tempfile.mkdtemp(prefix="cc_ckpt_"))):
        stats: dict = {}
        t0 = time.time()
        cc = dedup.connected_components(edges, checkpoint_dir=ckpt_dir,
                                        stats=stats)
        agg = cc.agg(F.count("*").alias("n"),
                     F.countDistinct("group_id").alias("groups"),
                     F.sum(F.xxhash64("u", "group_id")
                           .cast("decimal(38,0)")).alias("sig")).first()
        dt = time.time() - t0
        results[mode] = {"sec": round(dt, 2), "rounds": stats.get("rounds"),
                         "nodes": agg["n"], "groups": agg["groups"],
                         "sig": str(agg["sig"])}
        log(f"  {mode}: {results[mode]}")

    assert results["local"]["sig"] == results["durable"]["sig"], \
        "durable and local CC disagree!"
    pairs.unpersist()

    probe_post = copy_probe_gbps()
    out = {"metric": "CC durable vs local checkpoint (big regime)",
           "edges": n_edges, "docs_x": DOCS_X, "modes": results,
           "durable_overhead_x": round(
               results["durable"]["sec"] / results["local"]["sec"], 2),
           "probe_pre_gbps": probe_pre, "probe_post_gbps": probe_post}
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "big_regime.md")
    with open(md, "a") as fh:
        fh.write(f"\n## CC durable vs local checkpoint ({n_edges} edges, "
                 f"docs x{DOCS_X}, local[{cpus}], probes "
                 f"{probe_pre}/{probe_post} GB/s)\n\n")
        fh.write("| mode | rounds | sec | nodes | groups |\n|---|---|---|---|---|\n")
        for mode, r in results.items():
            fh.write(f"| {mode} | {r['rounds']} | {r['sec']} | {r['nodes']} | "
                     f"{r['groups']} |\n")
        fh.write(f"\ndurable overhead: {out['durable_overhead_x']}x "
                 f"(identical labels, sig-verified)\n")
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
