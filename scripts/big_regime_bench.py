#!/usr/bin/env python3
"""One-off larger-data-regime suite (round-2 verdict item #6).

At sf0.1 most operator queries finish in <1 s of Spark fixed cost, so
BENCH_r{N} differences are mostly scheduling noise. This script DERIVES
an sf1-like regime from the driver's sf0.1 parquet (no external data):
documents x10 and embeddings x4, each replica deterministically
perturbed (text gets a replica prefix, so shingles/minhashes differ;
embeddings get a tiny per-replica, per-dimension offset) — replication
without perturbation would make every row an exact duplicate and turn
the LSH buckets quadratic in the replica count, which measures the
wrong thing.

Runs the scale-sensitive queries once (best of 2) on the derived dir,
plus the corpus encode at 240k rows, stamps pre/post copy-bandwidth
probes, appends a table to BENCH/big_regime.md and prints one JSON
line.

Usage: python scripts/big_regime_bench.py [docs_x] [emb_x]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS_X = int(sys.argv[1]) if len(sys.argv) > 1 else 10
EMB_X = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "q21_text_profile", "q25_lang_stats",
    "q26_stratified_sample", "q27_pack_bins",
    "q28_vocab_df", "q29_doc_specificity",
    "q30_exact_dedup", "q31_minhash_signatures", "q32_lsh_candidate_pairs",
    "q36_minhash_fast", "q33_simhash",
    "q37_jaccard_estimate", "q34_ngram_jaccard",
    "q39_dedup_estimate_verify",  # r4: selective exact — compare vs q34's wall
    "q49_duplicated_spans",       # r4: substring-level exact dedup
    "q35_dedup_groups", "q38_dedup_apply",
    "q40_ann_bruteforce", "q42_ann_lsh", "q43_embedding_neardup",
    "q44_embedding_neardup_lsh",
    "q44_sized_bands",  # r4: 8-bit x 4-band sizing lever
    "q45_ann_ivf", "q46_kmeans_clusters",
    "q47_quantize_embeddings",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from bench import copy_probe_gbps

    probe_pre = copy_probe_gbps()
    log(f"probe pre: {probe_pre} GB/s")

    from pyspark.sql import functions as F

    from howard_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="howard_spark-bigregime", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="big_regime_")
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
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ereps = spark.range(EMB_X).select(F.col("id").alias("rep"))
    (emb.crossJoin(ereps)
     .select(
         (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
         F.expr("transform(embedding, (x, i) -> CAST(x + rep * 0.003 * "
                "sin(CAST(i AS DOUBLE) + CAST(rep AS DOUBLE)) AS FLOAT))")
         .alias("embedding"),
         "label")
     .repartition(cpus)
     .write.mode("overwrite").parquet(f"{big}/embeddings.parquet"))
    n_docs = spark.read.parquet(f"{big}/documents.parquet").count()
    n_emb = spark.read.parquet(f"{big}/embeddings.parquet").count()
    log(f"derived regime: {n_docs} docs, {n_emb} embeddings at {big}")

    from howard_spark.operators import load_all, load_extras

    queries, _ = load_all()
    extra_q, _ = load_extras()
    queries = {**queries, **extra_q}
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in QUERIES:
        fn = queries[name]
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = fn(spark, big).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 2)
        rows[name] = n
        log(f"  {name:32s} {best:7.2f}s  ({n} rows)")

    # corpus encode at 4x the headline row count
    from howard_spark.corpus import corpus_df
    from howard_spark.encode import encode_df

    corpus = corpus_df(spark, 240_000).cache()
    corpus.count()
    encode_df(corpus.limit(2000)).agg(F.sum("enc_bytes")).collect()
    best = None
    for _ in range(2):
        t0 = time.time()
        stats = (encode_df(corpus, partition_by=["repo", "path"])
                 .agg(F.sum("raw_bytes").alias("r"),
                      F.sum("enc_bytes").alias("e")).first())
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings["corpus_encode_240k"] = round(best, 2)
    gbps = round(stats["r"] / best / 1e9, 3)
    ratio = round(stats["r"] / stats["e"], 2)
    log(f"  corpus_encode_240k {best:.2f}s {gbps} GB/s ratio {ratio}x")

    probe_post = copy_probe_gbps()
    out = {
        "metric": "howard_spark big-regime suite",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "docs": n_docs, "embeddings": n_emb,
        "probe_pre_gbps": probe_pre, "probe_post_gbps": probe_post,
        "encode_gbps_240k": gbps, "compression_ratio_240k": ratio,
    }
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "big_regime.md")
    with open(md, "a") as fh:
        fh.write(f"\n## run (docs x{DOCS_X} = {n_docs}, emb x{EMB_X} = {n_emb}, "
                 f"local[{cpus}], probes {probe_pre}/{probe_post} GB/s)\n\n")
        fh.write("| query | sec | rows |\n|---|---|---|\n")
        for name in timings:
            fh.write(f"| {name} | {timings[name]} | {rows.get(name, '-')} |\n")
        fh.write(f"\ncorpus encode 240k: {gbps} GB/s, ratio {ratio}x\n")
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
