"""Relational operator coverage (SURVEY.md §2.2-2.9) on the driver tables.

Each query re-expresses a reference operator idiom Spark-first;
docstrings cite the reference site (file:line under /root/reference/)
whose semantics the query exercises. Scale notes:
- dimension joins are explicitly broadcast (nation/region/part are
  small dims at any SF);
- aggregations are single-pass conditional aggs, not UNIONs of
  subqueries, so only one shuffle on the group keys;
- top-k uses window rank partitioned by the key — the shuffle is on
  the partition key, and AQE handles skewed keys.

Float discipline: every double aggregate is rounded in BOTH engines so
the driver's value-hash is stable against summation order.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import query, t


# --- aggregations ----------------------------------------------------------

@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           round(avg(l_quantity), 4)                                  AS avg_qty,
           round(avg(l_extendedprice), 4)                             AS avg_price,
           count(*)                                                   AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf):
    """TPC-H Q1 shape — the A1/A3 groupBy-agg idiom
    (/root/reference/howard/objects/variants.py:600-607,716-726)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_top_customers",
    """
    SELECT c.c_name AS c_name, round(sum(o.o_totalprice), 2) AS total_spent
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_name
    ORDER BY total_spent DESC, c_name ASC
    LIMIT 10
    """,
)
def q02(spark, sf):
    """Equi-join + agg + deterministic top-k (J1 + O4,
    /root/reference/howard/objects/variants.py:6350-6392,10477-10497).

    Orders are PRE-AGGREGATED by custkey before the join (orders :
    customer is ~10:1), so the join input shrinks ~10x and the final
    per-name aggregation touches one row per customer — the plan that
    survives a 100x scale-up. Same answer: c_name is unique per
    custkey in this schema."""
    orders, cust = t(spark, sf, "orders"), t(spark, sf, "customer")
    per_cust = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("__spent"))
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .groupBy("c_name")
        .agg(F.round(F.sum("__spent"), 2).alias("total_spent"))
        .orderBy(F.desc("total_spent"), F.asc("c_name"))
        .limit(10)
    )


@query(
    "q03_region_rollup",
    """
    SELECT r.r_name AS r_name, n.n_name AS n_name, count(*) AS customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q03(spark, sf):
    """Star-schema dims joined via explicit broadcast (X7,
    /root/reference/howard/objects/variants.py:6350-6361) — nation and
    region are tiny at any scale, so no shuffle for the joins."""
    c = t(spark, sf, "customer")
    n = F.broadcast(t(spark, sf, "nation"))
    r = F.broadcast(t(spark, sf, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("customers"),
             F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"))
    )


@query(
    "q04_interval_join",
    """
    WITH bands(band, lo, hi) AS (
        VALUES ('tiny', 0, 9), ('small', 10, 19), ('mid', 20, 34), ('large', 35, 60)
    )
    SELECT b.band AS band, count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity <= b.hi
    GROUP BY b.band
    """,
)
def q04(spark, sf):
    """Interval/range join — the J2 region-annotation shape
    (/root/reference/howard/objects/variants.py:6326-6348). The small
    interval dim is broadcast, so the range join is a broadcast
    nested-loop with no shuffle of the fact table."""
    li = t(spark, sf, "lineitem")
    bands = F.broadcast(
        spark.createDataFrame(
            [("tiny", 0, 9), ("small", 10, 19), ("mid", 20, 34), ("large", 35, 60)],
            "band string, lo int, hi int",
        )
    )
    return (
        li.join(bands, (li.l_quantity >= bands.lo) & (li.l_quantity <= bands.hi))
        .groupBy("band")
        .agg(F.count("*").alias("n_items"),
             F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )


@query(
    "q05_top_order_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def q05(spark, sf):
    """W1 window top-1 per key
    (/root/reference/howard/objects/variants.py:10447-10474)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "q06_conditional_counts",
    """
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN l_quantity >= 30 AND l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk_taxed
    FROM lineitem
    """,
)
def q06(spark, sf):
    """A4 single-pass conditional counts — replaces the reference's
    UNION-of-count-subqueries (/root/reference/howard/objects/
    variants.py:733-772) with one scan and zero shuffles."""
    li = t(spark, sf, "lineitem")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))
    return li.agg(
        F.count("*").alias("n_total"),
        one(F.col("l_discount") > 0.05).alias("n_discounted"),
        one(F.col("l_returnflag") == "R").alias("n_returned"),
        one((F.col("l_quantity") >= 30) & (F.col("l_tax") > 0.04)).alias("n_bulk_taxed"),
    )


@query(
    "q07_substitution_matrix",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q07(spark, sf):
    """A5 two-column frequency matrix
    (/root/reference/howard/objects/variants.py:775-783)."""
    return t(spark, sf, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt")
    )


@query(
    "q08_string_agg",
    """
    SELECT r.r_name AS r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q08(spark, sf):
    """A6 string_agg per group
    (/root/reference/howard/objects/variants.py:6236-6238) — sorted
    inside the array so the result is order-deterministic."""
    n, r = t(spark, sf, "nation"), F.broadcast(t(spark, sf, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations"))
    )


@query(
    "q09_distinct",
    "SELECT DISTINCT o_orderpriority FROM orders",
)
def q09(spark, sf):
    """A7 distinct enumeration
    (/root/reference/howard/objects/variants.py:10697-10701)."""
    return t(spark, sf, "orders").select("o_orderpriority").distinct()


@query(
    "q10_union",
    """
    SELECT 'high' AS class, count(*) AS cnt FROM orders WHERE o_totalprice >= 150000
    UNION ALL
    SELECT 'low' AS class, count(*) AS cnt FROM orders WHERE o_totalprice < 150000
    """,
)
def q10(spark, sf):
    """U1 union of scalar counts
    (/root/reference/howard/objects/variants.py:742-768)."""
    o = t(spark, sf, "orders")
    hi = o.where(F.col("o_totalprice") >= 150000).agg(
        F.lit("high").alias("class"), F.count("*").alias("cnt")
    ).select("class", "cnt")
    lo = o.where(F.col("o_totalprice") < 150000).agg(
        F.lit("low").alias("class"), F.count("*").alias("cnt")
    ).select("class", "cnt")
    return hi.unionByName(lo)


@query(
    "q11_regex_filter",
    """
    SELECT c_mktsegment, count(*) AS cnt
    FROM customer
    WHERE regexp_matches(c_name, '[13579]$')
    GROUP BY c_mktsegment
    """,
)
def q11(spark, sf):
    """P4 regex predicate
    (/root/reference/howard/objects/variants.py:8052-8056,640)."""
    return (
        t(spark, sf, "customer")
        .where(F.col("c_name").rlike("[13579]$"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q12_explode_tokens",
    """
    SELECT tok AS tok, count(*) AS cnt
    FROM (SELECT unnest(string_split(p_type, ' ')) AS tok FROM part)
    GROUP BY tok
    """,
)
def q12(spark, sf):
    """F8 UDTF explode — string -> rows, fully native
    (/root/reference/howard/objects/variants.py:10652-10661;
    explode_annotation_format /root/reference/howard/functions/
    commons.py:714-801)."""
    return (
        t(spark, sf, "part")
        .select(F.explode(F.split(F.col("p_type"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q13_case_cast",
    driver=False,  # merged into q13_scalar_rowid (driver gate)
    oracle="""
    SELECT CASE WHEN o_totalprice >= 200000 THEN 'platinum'
                WHEN o_totalprice >= 100000 THEN 'gold'
                ELSE 'standard' END AS tier,
           count(*) AS cnt,
           round(avg(CAST(o_custkey AS DOUBLE)), 4) AS avg_custkey
    FROM orders GROUP BY tier
    """,
)
def q13(spark, sf):
    """P5 CASE/CAST criteria — the prioritization idiom
    (/root/reference/howard/objects/variants.py:7676-7704) as one
    select with a when-chain instead of N sequential UPDATEs."""
    o = t(spark, sf, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 200000, "platinum")
        .when(F.col("o_totalprice") >= 100000, "gold")
        .otherwise("standard")
    )
    return (
        o.select(tier.alias("tier"), "o_custkey")
        .groupBy("tier")
        .agg(F.count("*").alias("cnt"),
             F.round(F.avg(F.col("o_custkey").cast("double")), 4).alias("avg_custkey"))
    )


@query(
    "q14_row_id_hash",
    driver=False,  # merged into q13_scalar_rowid (driver gate)
    oracle="""
    SELECT count(DISTINCT md5(l_orderkey || '|' || l_linenumber || '|' || l_partkey))
           AS n_distinct_ids
    FROM lineitem
    """,
)
def q14(spark, sf):
    """Stable row-id via hash of key columns — the variant_id idiom
    (/root/reference/howard/objects/variants.py:2798-2808). md5 is
    engine-portable; the engine-internal fast path is xxhash64."""
    li = t(spark, sf, "lineitem")
    rid = F.md5(F.concat_ws("|", "l_orderkey", "l_linenumber", "l_partkey"))
    return li.agg(F.countDistinct(rid).alias("n_distinct_ids"))


@query(
    "q13_scalar_rowid",
    """
    SELECT CASE WHEN o_totalprice >= 200000 THEN 'platinum'
                WHEN o_totalprice >= 100000 THEN 'gold'
                ELSE 'standard' END AS tier,
           count(*) AS cnt,
           CAST(sum(o_custkey) AS BIGINT) AS sum_custkey,
           CAST(count(DISTINCT md5(o_orderkey || '|' || o_custkey)) AS BIGINT)
               AS n_distinct_ids,
           min(md5(o_orderkey || '|' || o_custkey)) AS min_rid
    FROM orders GROUP BY tier
    """,
)
def q13_scalar_rowid(spark, sf):
    """P5 CASE/CAST prioritization tiers + the stable hash row-id idiom
    (q13 + q14, kept as pytest extras) fused into one gate: per-tier
    counts, distinct-id counts AND the min md5 id (which hash-verifies
    the actual hash bytes cross-engine, not just distinctness).
    Ref idioms: variants.py:7676-7704 (CASE chain), :2798-2808
    (variant_id hash)."""
    o = t(spark, sf, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 200000, "platinum")
        .when(F.col("o_totalprice") >= 100000, "gold")
        .otherwise("standard")
    )
    rid = F.md5(F.concat_ws("|", "o_orderkey", "o_custkey"))
    return (
        o.select(tier.alias("tier"), "o_custkey", rid.alias("rid"))
        .groupBy("tier")
        .agg(F.count("*").alias("cnt"),
             # exact bigint sum, NOT round(avg(int)) — integer ratios can
             # land on decimal ties where Spark HALF_UP and DuckDB
             # half-even diverge (CLAUDE.md, the 41/640 class); the avg
             # is derivable downstream as sum/cnt.
             F.sum("o_custkey").cast("bigint").alias("sum_custkey"),
             F.countDistinct("rid").cast("bigint").alias("n_distinct_ids"),
             F.min("rid").alias("min_rid"))
    )


@query(
    "q17_semi_anti_join",
    """
    SELECT 'semi:' || c_mktsegment AS k, count(*) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'anti:orders' AS k, count(*) AS cnt
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    """,
)
def q17_semi_anti(spark, sf):
    """Semi-join + anti-join in one gate (q17 + q18, kept as pytest
    extras): per-segment counts of customers having a qualifying order,
    unioned with the NOT-EXISTS order count
    (ref idiom variants.py:6144-6153)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    big = o.where(F.col("o_totalprice") > 250000)
    semi = (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
        .select(F.concat(F.lit("semi:"), "c_mktsegment").alias("k"), "cnt")
    )
    bld = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    anti = (
        o.join(bld, o.o_custkey == bld.c_custkey, "left_anti")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("anti:orders").alias("k"), "cnt")
    )
    return semi.unionByName(anti)


@query(
    "q15_stats",
    """
    SELECT l_returnflag,
           round(avg(l_quantity), 4)          AS avg_q,
           min(l_quantity)                    AS min_q,
           max(l_quantity)                    AS max_q,
           round(stddev_samp(l_quantity), 4)  AS stddev_q,
           round(var_samp(l_quantity), 4)     AS var_q,
           round(median(l_quantity), 4)       AS median_q
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q15(spark, sf):
    """A3 full stats block incl. median
    (/root/reference/howard/objects/variants.py:716-726)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_q"),
            F.min("l_quantity").alias("min_q"),
            F.max("l_quantity").alias("max_q"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_q"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_q"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_q"),
        )
    )


@query(
    "q16_left_join_coalesce",
    """
    SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
           count(*) AS cnt, round(sum(o.o_totalprice), 2) AS total
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY segment
    """,
)
def q16(spark, sf):
    """J5 left-join + coalesce merge
    (/root/reference/howard/objects/variants.py:2635-2689)."""
    o, c = t(spark, sf, "orders"), t(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .select(F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"), "o_totalprice")
        .groupBy("segment")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "q17_anti_join",
    driver=False,  # merged into q17_semi_anti_join (driver gate)
    oracle="""
    SELECT count(*) AS n_orders
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
    )
    """,
)
def q17(spark, sf):
    """Anti-join — the NOT-IN guard idiom
    (/root/reference/howard/objects/variants.py:6144-6153)."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q18_semi_join",
    driver=False,  # merged into q17_semi_anti_join (driver gate)
    oracle="""
    SELECT c_mktsegment, count(*) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    GROUP BY c_mktsegment
    """,
)
def q18(spark, sf):
    """Semi-join (customers having a qualifying order)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").where(F.col("o_totalprice") > 250000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q19_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def q19(spark, sf):
    """Window frame (running total per customer) — frames are absent
    in the reference (SURVEY.md §2.5) but essential pipeline algebra."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q20_time_bucket",
    """
    SELECT date_trunc('hour', ts) AS bucket, event_type,
           count(*) AS events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY bucket, event_type
    """,
)
def q20(spark, sf):
    """Hourly rollup of the event stream — batch form of the
    streaming windowed agg (howard_spark.streaming)."""
    return (
        t(spark, sf, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
        .agg(F.count("*").alias("events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """AS-OF JOIN with direction and tolerance (DuckDB/kdb/pandas
    merge_asof semantics, inclusive):

    - ``backward``: latest right row with ``right.ts <= left.ts``
    - ``forward`` : earliest right row with ``right.ts >= left.ts``
    - ``nearest`` : whichever of the two is closer in |ts|; exact ties
      go to the backward match (pandas convention)
    - ``tolerance``: a match farther than this in |ts| becomes NULLs

    Spark-first shape: ONE union + per-direction ONE window pass over
    the same key partitioning (nearest = two window passes, still one
    shuffle). All right-side payload columns (plus the matched ts)
    travel as ONE atomic struct carried by last/first(ignorenulls), so
    a genuine NULL *inside* the matching right row survives intact
    instead of back-filling from another row. Right rows tied on
    (key, ts) are ordered by a full-row xxhash64 so the winner is
    deterministic across runs (up to 64-bit collisions of
    *non-identical* rows, ~2^-64). No range self-join, no per-key
    collect; skewed keys can pre-salt on a coarse ts bucket.
    """
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    right_cols = right_cols or [
        c for c in right.columns if c not in key_cols and c != ts_col
    ]
    lcols = [c for c in left.columns]
    r_struct_type = StructType(
        [StructField("__ts", right.schema[ts_col].dataType)]
        + [right.schema[c] for c in right_cols])
    # side tags: right rows must fall INSIDE the frame at equal ts for
    # both directions — backward frames end at the current row (right
    # sorts first), forward frames start at it (right sorts last), so
    # each direction gets its own side ordering below.
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
        F.lit(0).cast("bigint").alias("__tie"),
    )
    r_tag = right.select(
        *key_cols,
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in key_cols and c != ts_col],
        F.lit(0).alias("__side"),
        F.struct(F.col(ts_col).alias("__ts"),
                 *[F.col(c).alias(c) for c in right_cols]).alias("__r"),
        F.xxhash64(*[F.col(c) for c in right.columns]).alias("__tie"),
    ).select(*l_tag.columns)
    u = l_tag.unionByName(r_tag)

    part = Window.partitionBy(*key_cols)
    fills = {}
    if direction in ("backward", "nearest"):
        wb = (part.orderBy(F.asc(ts_col), F.asc("__side"), F.asc("__tie"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        fills["__rb"] = F.last("__r", ignorenulls=True).over(wb)
    if direction in ("forward", "nearest"):
        wf = (part.orderBy(F.asc(ts_col), F.desc("__side"), F.asc("__tie"))
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        fills["__rf"] = F.first("__r", ignorenulls=True).over(wf)
    filled = u.select(*u.columns, *[c.alias(n) for n, c in fills.items()])

    from pyspark.sql.types import DateType, TimestampType

    def _num(c):
        # timestamps compare as epoch seconds; numerics compare raw.
        # DateType has no direct cast-to-double in Spark — go via
        # timestamp (midnight UTC epoch seconds, consistent both sides).
        dt = left.schema[ts_col].dataType
        if isinstance(dt, DateType):
            return c.cast("timestamp").cast("double")
        if isinstance(dt, TimestampType):
            return c.cast("double")
        return c

    if direction == "backward":
        match = F.col("__rb")
    elif direction == "forward":
        match = F.col("__rf")
    else:
        db = F.abs(_num(F.col(ts_col)) - _num(F.col("__rb")["__ts"]))
        df_ = F.abs(_num(F.col("__rf")["__ts"]) - _num(F.col(ts_col)))
        match = (
            F.when(F.col("__rb").isNull(), F.col("__rf"))
            .when(F.col("__rf").isNull(), F.col("__rb"))
            .when(df_ < db, F.col("__rf"))
            .otherwise(F.col("__rb"))  # ties -> backward
        )
    if tolerance is not None:
        match = F.when(
            F.abs(_num(F.col(ts_col)) - _num(match["__ts"]))
            <= F.lit(tolerance), match)
    return (
        filled.where(F.col("__side") == 1)
        .withColumn("__m", match)
        .select(*lcols,
                *[F.col("__m")[c].alias(f"{c}{suffix}") for c in right_cols])
    )


@query(
    "q70_asof_join",
    """
    SELECT l.event_id AS event_id, l.user_id AS user_id,
           r.event_id AS purchase_event,
           r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q70(spark, sf):
    """AS-OF join gate: every click joined to the user's latest
    preceding purchase — checked against DuckDB's native ASOF JOIN."""
    ev = t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value")
    out = asof_join(clicks, purchases, key_cols=["user_id"], ts_col="ts",
                    right_cols=["event_id", "value"])
    return out.select(
        "event_id", "user_id",
        F.col("event_id_asof").alias("purchase_event"),
        F.col("value_asof").alias("purchase_value"),
    )


@query(
    "q71_asof_forward",
    """
    SELECT l.event_id AS event_id, l.user_id AS user_id,
           r.event_id AS next_purchase,
           r.value AS next_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def q71(spark, sf):
    """Forward AS-OF gate: every click joined to the user's NEXT
    purchase (earliest right.ts >= left.ts) — checked against DuckDB's
    native forward ASOF JOIN."""
    ev = t(spark, sf, "events")
    clicks = ev.where(F.col("event_type") == "click")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value")
    out = asof_join(clicks, purchases, key_cols=["user_id"], ts_col="ts",
                    right_cols=["event_id", "value"], direction="forward")
    return out.select(
        "event_id", "user_id",
        F.col("event_id_asof").alias("next_purchase"),
        F.col("value_asof").alias("next_value"),
    )
