#!/usr/bin/env python3
"""Isolate q39_dedup_estimate_verify stage costs (guide §1.4, noop/count).

Times, in one session with labeled jobs:
  1. shingle_sets_df count         (the Arrow sets kernel alone)
  2. est pipeline count            (minhash + band join + estimate)
  3. full q39 count                (est + borderline exact stage)
  4. exact stage only              (borderline pairs from a persisted est)
Prints per-rep seconds; run against SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from howard_spark.operators import dedup
    from howard_spark.session import get_spark

    spark = get_spark(app="howard_spark-q39-stages")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sc = spark.sparkContext

    def timed(label, thunk, reps=3):
        outs = []
        for r in range(reps):
            sc.setJobDescription(f"{label}#{r}")
            t0 = time.perf_counter()
            n = thunk()
            outs.append(time.perf_counter() - t0)
        print(f"{label:28s} n={n:>9} " +
              " ".join(f"{s:6.2f}" for s in outs), flush=True)

    timed("sets_kernel", lambda: dedup.shingle_sets_df(spark, sf).count())
    timed("est_pipeline", lambda: dedup.q37(spark, sf).count())

    def full():
        return dedup.dedup_estimate_verify(spark, sf).count()
    timed("q39_full", full)

    est = dedup.q37(spark, sf).persist()
    est.count()
    border = est.where((F.col("est_matches") >= dedup.EST_LO)
                       & (F.col("est_matches") < dedup.EST_HI))
    print(f"borderline pairs: {border.count()}", flush=True)
    sets = dedup.shingle_sets_df(spark, sf)

    def exact_only():
        return dedup.exact_pair_scores(border, sets=sets).count()
    timed("exact_stage_only", exact_only)
    spark.stop()


if __name__ == "__main__":
    main()
