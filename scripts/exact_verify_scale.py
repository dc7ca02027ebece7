#!/usr/bin/env python3
"""Scale proof for the round-5 exact-verify kernel fix (r4 verdict #1).

Derives docs-only regimes at growing replica factors from sf0.1 (same
perturbation recipe as big_regime_bench.py) and, at each size, measures

- q39 (estimate-then-verify) wall with the NEW kernel (semi-join the
  shingle-set table to borderline docs; broadcast only if the runtime
  size fits — exact_pair_scores);
- the quantity the OLD shape broadcast unconditionally: every doc's
  shingle set (docs_total / set_bytes_full) vs what the new kernel can
  at most materialize per executor (borderline docs only:
  docs_borderline / set_bytes_borderline).

"Stays flat" claim: set_bytes_borderline tracks the borderline-pair
population (the est window), while set_bytes_full grows linearly with
the corpus — at 100x docs the old shape OOMs every executor, the new
shape's exact stage scales with the work that actually needs exactness.

Usage: python scripts/exact_verify_scale.py [x1 x2 ...]   (default 5 10 20)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

XS = [int(x) for x in sys.argv[1:]] or [5, 10, 20]
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# rough JVM bytes per shingle in a collected array (9-char string +
# object/offset overhead) — only used to report comparable magnitudes
BYTES_PER_SHINGLE = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from bench import copy_probe_gbps

    probe_pre = copy_probe_gbps()
    log(f"probe pre: {probe_pre} GB/s")

    from pyspark.sql import functions as F

    from howard_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="howard_spark-exactscale", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from howard_spark.operators import dedup

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    rows = []
    for x in XS:
        big = tempfile.mkdtemp(prefix=f"exact_scale_x{x}_")
        reps = spark.range(x).select(F.col("id").alias("rep"))
        (docs.crossJoin(reps)
         .select(
             (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
             F.when(F.col("rep") == 0, F.col("text"))
             .otherwise(F.concat(F.lit("v"), F.col("rep").cast("string"),
                                 F.lit(" "), F.col("text"))).alias("text"),
             "lang", "source", "n_chars")
         .repartition(cpus)
         .write.mode("overwrite").parquet(f"{big}/documents.parquet"))
        n_docs = spark.read.parquet(f"{big}/documents.parquet").count()

        # borderline population + the two broadcast-candidate sizes
        est = dedup.q37(spark, big)
        border = est.where(
            (F.col("est_matches") >= dedup.EST_LO)
            & (F.col("est_matches") < dedup.EST_HI))
        n_pairs = est.count()
        n_border = border.count()
        needed = (border.select(F.col("doc_a").alias("doc_id"))
                  .unionByName(border.select(F.col("doc_b").alias("doc_id")))
                  .distinct())
        sh = dedup._shingles_df(spark, big).distinct()
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
        full_shingles = sizes.agg(F.sum("n")).first()[0] or 0
        border_shingles = (sizes.join(needed, "doc_id", "left_semi")
                           .agg(F.sum("n")).first()[0] or 0)
        n_border_docs = needed.count()

        # q39 wall with the new kernel (best of 2)
        best = None
        for _ in range(2):
            t0 = time.time()
            n39 = dedup.q39(spark, big).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)

        row = {
            "x": x, "docs": n_docs, "pairs": n_pairs,
            "border_pairs": n_border, "border_docs": n_border_docs,
            "set_mb_full": round(full_shingles * BYTES_PER_SHINGLE / 1e6, 1),
            "set_mb_borderline": round(
                border_shingles * BYTES_PER_SHINGLE / 1e6, 1),
            "q39_sec": round(best, 2), "q39_rows": n39,
        }
        rows.append(row)
        log(f"  x{x}: {row}")

    probe_post = copy_probe_gbps()
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "big_regime.md")
    with open(md, "a") as fh:
        fh.write(f"\n## exact-verify scale proof (round-5 kernel, local[{cpus}], "
                 f"probes {probe_pre}/{probe_post} GB/s)\n\n")
        fh.write("| x | docs | cand pairs | borderline pairs | borderline docs "
                 "| old-shape broadcast MB (ALL sets) | new-shape exact-stage MB "
                 "(borderline sets) | q39 sec |\n|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            fh.write(f"| {r['x']} | {r['docs']} | {r['pairs']} | "
                     f"{r['border_pairs']} | {r['border_docs']} | "
                     f"{r['set_mb_full']} | {r['set_mb_borderline']} | "
                     f"{r['q39_sec']} |\n")
    print(json.dumps({"metric": "exact-verify scale proof", "rows": rows,
                      "probe_pre_gbps": probe_pre,
                      "probe_post_gbps": probe_post}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
