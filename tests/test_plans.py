"""Physical-plan shape assertions: the plans we designed for 100 TB
must stay the plans Catalyst actually picks.

- scans push filters and prune columns;
- small dimensions broadcast (no sort-merge on dims);
- LSH candidate generation never degenerates to a cartesian product;
- the HGVS variant x transcript interval join broadcasts the
  transcript spans.

(Complements test_encode_spark.py::test_bucketed_decode_no_shuffle.)
"""

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_scan_pushdown_and_pruning(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .where(F.col("l_quantity") > 30)
          .select("l_orderkey", "l_quantity"))
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(f.split(":")[0] for f in m.group(1).split(",")) == {
        "l_orderkey", "l_quantity"}


def test_q03_broadcasts_dims(spark):
    from howard_spark.operators.relational import q03

    plan = _plan(q03(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q32_no_cartesian(spark):
    from howard_spark.operators.dedup import q32

    plan = _plan(q32(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q44_band_join_is_equijoin(spark):
    from howard_spark.operators.similarity import q44

    plan = _plan(q44(spark, SF))
    # candidate generation must stay keyed on (band, bkey) — since r6 a
    # single hash-partitioned exchange feeding the grouped numpy pair
    # kernel (FlatMapGroupsInArrow) — never an all-pairs nested loop,
    # and never a per-pair join-back of the embedding arrays
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInArrow" in plan
    assert re.search(r"hashpartitioning\(band", plan)
    # no join survives: pairs are born inside the per-bucket kernel
    assert "Join" not in plan


def test_hgvs_transcript_join_broadcasts(spark):
    from howard_spark.functions.hgvs_fixture import demo_genome, demo_transcripts
    from howard_spark.operators.hgvs_spark import annotate_hgvs

    df = spark.createDataFrame(
        [("chrT", 135, "A", "T")], "chrom string, pos long, ref string, alt string")
    out = annotate_hgvs(df, demo_transcripts(), demo_genome())
    plan = _plan(out)
    # range predicate + tiny dim => broadcast nested-loop is the right
    # physical join; what must NOT appear is a shuffled cartesian
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_annotate_equi_broadcast_hint(spark):
    from howard_spark.operators.variants import annotate_equi

    v = spark.createDataFrame(
        [("chr1", 1, "A", "T", "")],
        "`#CHROM` string, POS long, REF string, ALT string, INFO string")
    ann = spark.createDataFrame(
        [("chr1", 1, "A", "T", "x")],
        "`#CHROM` string, POS long, REF string, ALT string, tag string")
    plan = _plan(annotate_equi(v, ann, broadcast_ann=True))
    assert "BroadcastHashJoin" in plan


def test_kmeans_assign_broadcasts_centroids(spark):
    from howard_spark.operators.similarity import _kmeans_assign

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = e.limit(8).select(
        F.col("vec_id").alias("cid"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ce"))
    plan = _plan(_kmeans_assign(e, cent))
    # since r6 assignment is a pure MAP over the scan (centroids are a
    # bounded k-row collect closed over by the Arrow kernel): no join,
    # no window shuffle — no Exchange at all
    assert "MapInArrow" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange" not in plan


def test_connected_components_equijoins_only(spark):
    from howard_spark.operators.dedup import _cc_large_star, _cc_small_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "u long, v long")
    for step in (_cc_large_star, _cc_small_star):
        plan = _plan(step(edges))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_pack_bins_window_is_partitioned(spark):
    from howard_spark.operators.text import pack_bins

    toks = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens"))
    plan = _plan(pack_bins(toks, capacity=64, n_buckets=8))
    # the running sum must NOT be a global single-partition window:
    # the window's exchange hashes on the range bucket
    assert "hashpartitioning(__b" in plan
    assert "SinglePartition" not in plan


def test_q39_selective_exact_broadcasts_sets(spark):
    from howard_spark.operators.dedup import q39

    plan = _plan(q39(spark, SF))
    # per-doc shingle sets broadcast to the borderline pairs; candidate
    # generation stays equi-join — no cartesian anywhere in the union
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q49_span_window_is_per_doc(spark):
    from howard_spark.operators.dedup import q49

    plan = _plan(q49(spark, SF))
    # gaps-and-islands window partitions BY DOC (parallel), never a
    # global single-task window; dup-gram filtering is an equi-join
    assert "hashpartitioning(doc_id" in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_q21_profile_single_scan_no_exchange(spark):
    from howard_spark.operators.text import q21_profile

    plan = _plan(q21_profile(spark, SF))
    # the fused per-doc profile must stay ONE codegen'd projection over
    # the scan — any Exchange means an accidental aggregation snuck in
    assert "Exchange" not in plan
    assert "*(1) Project" in plan


def test_exact_verify_semijoin_restricts_sets(spark):
    """Round-5 scale fix (r4 verdict #1): the exact-verify kernels must
    never build shingle sets for the whole corpus — the set table is
    semi-join-restricted to docs appearing in the candidate/borderline
    pairs BEFORE the pair join, and Catalyst pushes that semi join below
    the shingle explode (so even shingling runs only on needed docs)."""
    from howard_spark.operators.dedup import q34, q39

    for gate in (q34, q39):
        plan = _plan(gate(spark, SF))
        assert "LeftSemi" in plan, gate.__name__
        assert "CartesianProduct" not in plan


def test_exact_pair_scores_shuffle_mode_matches_broadcast(spark):
    """The broadcast and shuffle strategies of exact_pair_scores are the
    same operator: identical rows, and the forced-shuffle plan really
    does join without broadcasting the set table (the >memory path)."""
    from howard_spark.operators.dedup import (_shingles_df,
                                              exact_pair_scores, q32)

    pairs = q32(spark, SF)
    sh = _shingles_df(spark, SF).distinct()
    rows_b = sorted(map(tuple, exact_pair_scores(
        pairs, sh, join_mode="broadcast").collect()))
    shuffled = exact_pair_scores(pairs, sh, join_mode="shuffle")
    rows_s = sorted(map(tuple, shuffled.collect()))
    assert rows_b == rows_s and len(rows_b) > 0
    # the two set-side joins must be sort-merge under the hint (the
    # needed-ids semi join MAY still broadcast — it carries only ids)
    assert len(re.findall(r"SortMergeJoin .*, Inner", _plan(shuffled))) >= 2


def test_q88_semdedup_within_cluster_only(spark):
    """SemDeDup prune compares pairs ONLY within a k-means cluster:
    the self-join must be an equi-join on cid, never a cartesian."""
    from howard_spark.operators.similarity import q88

    plan = _plan(q88(spark, SF))
    assert "CartesianProduct" not in plan
    # the PRUNE must stay keyed on cid — since r6 a single
    # hash-partitioned exchange feeding the grouped numpy pair kernel
    # (same contract as q44's guard), never an all-pairs join
    assert "FlatMapGroupsInArrow" in plan
    assert re.search(r"hashpartitioning\(cid", plan)
