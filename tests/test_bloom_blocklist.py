"""Bloom-prefiltered blocklist decontamination (q89): the prefilter is
a pure scan-stage codegen predicate with NO false negatives, survivors
are a tiny fraction of the corpus, and the exact join re-verifies."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _parts(spark):
    from howard_spark.operators.text import bloom_prefilter

    d = spark.read.parquet(f"{SF}/documents.parquet")
    hashed = d.select("doc_id", F.md5(F.substring("text", 1, 32)).alias("h"))
    block = hashed.where(F.col("doc_id") % 7 == 0).select("h").distinct()
    corpus = hashed.where(F.col("doc_id") % 7 != 0)
    return corpus, block, bloom_prefilter(corpus, block)


def test_bloom_no_false_negatives_and_selective(spark):
    corpus, block, pref = _parts(spark)
    # USING-joins put the key column first — re-select so exceptAll's
    # POSITIONAL compare lines up with pref's (doc_id, h)
    true_matches = (corpus.join(block, "h", "left_semi")
                    .select("doc_id", "h"))
    # superset property: every true match survives the prefilter
    assert true_matches.exceptAll(pref.select("doc_id", "h")).isEmpty()
    # selectivity: survivors are a small fraction of the corpus
    n_corpus, n_pref, n_true = (corpus.count(), pref.count(),
                                true_matches.count())
    assert n_true <= n_pref <= n_true + 0.05 * n_corpus
    assert n_true > 0  # the gate is not vacuous


def test_bloom_prefilter_is_scan_stage(spark):
    corpus, block, pref = _parts(spark)
    plan = pref._jdf.queryExecution().executedPlan().toString()
    # the probe is a plain Filter over the scan — no join, no exchange
    # on the corpus side introduced by the prefilter itself
    assert "substring" in plan
    assert "Join" not in plan
