"""Core relational inventory (SURVEY.md §2 B/C/D/F/G) as oracle pairs.

Each query is intentionally narrow — one operator family per entry so
the driver's CORRECTNESS report maps 1:1 onto the §2 table. The ETL
composites in plans/ chain these same operators into the
reference-shaped pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


def with_sql_empty_grand_total(grouped: DataFrame, grand: DataFrame) -> DataFrame:
    """SQL's CUBE/ROLLUP () grouping set emits ONE grand-total row even
    over an empty input; Spark's cube()/rollup() emit zero rows there
    (measured divergence, round-6 adversarial sweep). Union the
    globally-aggregated grand row exactly when the grouped result is
    empty: any non-empty input already carries its () row, so the probe
    is `grouped LIMIT 1` anti-joined against the grand row — lazy, two
    O(1) subplans, nothing row-scaled."""
    probe = grouped.select(F.lit(1).alias("__any")).limit(1)
    missing = grand.join(probe, F.lit(True), "left_anti")
    return grouped.unionByName(missing)


# --------------------------------------------------------------------------
# B. projection / filter / predicates
# --------------------------------------------------------------------------


@register(
    "b_project_rename",
    oracle="""
SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment
FROM customer ORDER BY cust_id
""",
    tags=("B1",),
)
def b_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: column select + rename map (the reference's header-rename
    stage). Column pruning reaches the scan: ReadSchema keeps 3 of 5."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            F.col("c_custkey").alias("cust_id"),
            F.col("c_name").alias("cust_name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("cust_id")
    )


@register(
    "b_cast_clean",
    oracle="""
SELECT o_orderkey,
  TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
  CAST(floor(o_totalprice) AS BIGINT) AS price_int,
  CAST(o_orderdate AS DATE) AS order_day,
  TRY_CAST(o_orderstatus AS INT) AS bad_cast
FROM orders ORDER BY o_orderkey
""",
    tags=("B2",),
)
def b_cast_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: dtype cleaning — string→int, double→bigint, ts→date, and a
    try_cast that yields NULL on bad values (the reference's
    bad-value→null convention)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").alias("prio_num"),
            F.floor("o_totalprice").alias("price_int"),
            F.col("o_orderdate").cast("date").alias("order_day"),
            F.expr("try_cast(o_orderstatus AS INT)").alias("bad_cast"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "b_filter_between",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_extendedprice > 1000
ORDER BY l_orderkey, l_linenumber
""",
    tags=("B3",),
)
def b_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: comparison/BETWEEN predicates, all pushed to the parquet scan
    (PushedFilters shows GreaterThanOrEqual/LessThanOrEqual)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
            )
            & (F.col("l_extendedprice") > 1000)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "b_filter_set_pattern",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
  AND c_name LIKE 'C%'
  AND regexp_matches(c_name, '[0-9]')
  AND c_acctbal IS NOT NULL
ORDER BY c_custkey
""",
    tags=("B4",),
)
def b_filter_set_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: IN-list / LIKE / regexp / null-test predicates (the
    reference's agency/state whitelist filters)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_name").like("C%")
            & F.col("c_name").rlike("[0-9]")
            & F.col("c_acctbal").isNotNull()
        )
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "b_null_handling",
    oracle="""
SELECT c_custkey,
  COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal,
  COALESCE(CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END,
           'UNKNOWN') AS segment
FROM customer ORDER BY c_custkey
""",
    tags=("B5", "B6"),
)
def b_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: blank→null normalization then fill — the reference's
    empty-string cleanup, expressed as when()+na.fill/coalesce."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
            F.when(F.col("c_mktsegment") == "BUILDING", None)
            .otherwise(F.col("c_mktsegment"))
            .alias("segment"),
        )
        .na.fill({"bal": 0.0, "segment": "UNKNOWN"})
        .orderBy("c_custkey")
    )


@register(
    "b_conditional_bucket",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            WHEN o_totalprice < 300000 THEN 'large'
            ELSE 'jumbo' END AS bucket,
  count(*) AS cnt, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY bucket ORDER BY bucket
""",
    tags=("B6", "D1"),
)
def b_conditional_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: CASE WHEN ladder (fine-amount bucketing in the reference)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# C. joins
# --------------------------------------------------------------------------


@register(
    "c_left_outer_join",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, COALESCE(o.cnt, 0) AS n_orders,
  round(COALESCE(o.total, 0.0), 2) AS total
FROM customer c
LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt, sum(o_totalprice) AS total
  FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY o_custkey
) o ON o.o_custkey = c.c_custkey
ORDER BY c.c_custkey
""",
    tags=("C2", "B5"),
)
def c_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: left outer join keeping customers with no recent orders
    (reference: unmapped codes keep their raw description)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"), F.sum("o_totalprice").alias("total"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("cnt", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("total", F.lit(0.0)), 2).alias("total"),
        )
        .orderBy("c_custkey")
    )


@register(
    "c_full_outer_join",
    oracle="""
SELECT COALESCE(a.c_nationkey, b.s_nationkey) AS nationkey,
  COALESCE(a.n_cust, 0) AS n_cust, COALESCE(b.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer
      WHERE c_acctbal > 9000 GROUP BY c_nationkey) a
FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier
      WHERE s_acctbal > 5000 GROUP BY s_nationkey) b
  ON a.c_nationkey = b.s_nationkey
ORDER BY nationkey
""",
    tags=("C2",),
)
def c_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: full outer join over two filtered per-nation aggregates —
    nations present on only one side survive with zero-filled counts."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "c_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
    tags=("C4",),
)
def c_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: left-semi join = EXISTS filter; no columns from the right
    side, no row multiplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "c_anti_join",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31')
ORDER BY c_custkey
""",
    tags=("C5",),
)
def c_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: left-anti join = NOT EXISTS — the reference's new-record
    detection (only unseen plates get fresh anon ids)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1995-12-31").cast("timestamp")
        )
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "c_cross_join",
    oracle="""
SELECT r.r_name, s.o_orderstatus
FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
ORDER BY r_name, o_orderstatus
""",
    tags=("C6",),
)
def c_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: cartesian product of two tiny inputs (BroadcastNestedLoop).
    The only sane cross join at scale: both sides bounded."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).orderBy("r_name", "o_orderstatus")


@register(
    "c_range_join",
    oracle="""
SELECT b.tier, count(*) AS cnt, round(avg(c.c_acctbal), 6) AS avg_bal
FROM customer c
JOIN (VALUES ('t0_neg', -1000.0, 0.0), ('t1_low', 0.0, 2500.0),
             ('t2_mid', 2500.0, 5000.0), ('t3_high', 5000.0, 7500.0),
             ('t4_top', 7500.0, 10000.0)) AS b(tier, lo, hi)
  ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
GROUP BY b.tier ORDER BY b.tier
""",
    tags=("C7",),
)
def c_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: theta/range join — value-to-bin assignment (the stand-in for
    the reference's geocoding step: point → polygon-as-bin).

    The bin table is tiny → Catalyst broadcasts and the non-equi
    predicate runs as BroadcastNestedLoopJoin. At 100 TB the bins stay
    broadcast-size, so this plan shape survives scale-up; for
    large-large range joins, pre-bucket both sides to make it an
    equi-join (operators/rangejoin.py).
    """
    c = load_table(spark, sf_dir, "customer")
    bins = local_df(
        spark,
        [
            ("t0_neg", -1000.0, 0.0),
            ("t1_low", 0.0, 2500.0),
            ("t2_mid", 2500.0, 5000.0),
            ("t3_high", 5000.0, 7500.0),
            ("t4_top", 7500.0, 10000.0),
        ],
        "tier string, lo double, hi double",
    )
    return (
        c.join(
            F.broadcast(bins),
            (c.c_acctbal >= bins.lo) & (c.c_acctbal < bins.hi),
        )
        .groupBy("tier")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("c_acctbal"), 6).alias("avg_bal"))
        .orderBy("tier")
    )


@register(
    "c_sort_merge_join",
    oracle="""
SELECT o.o_orderpriority, count(*) AS cnt,
  round(sum(l.l_extendedprice), 2) AS total
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
    tags=("C9",),
)
def c_sort_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: large-large equi-join forced to SortMergeJoin via the merge
    hint — the strategy that handles two 100-TB-side joins (no build
    side needs to fit in memory; both sides shuffle on the key)."""
    o = load_table(spark, sf_dir, "orders").hint("merge")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# D. aggregations
# --------------------------------------------------------------------------


@register(
    "d_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
  round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    tags=("D4",),
)
def d_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: hierarchical subtotals — (flag,status), (flag), () levels."""
    li = load_table(spark, sf_dir, "lineitem")
    rolled = li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )
    grand = li.agg(
        F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    ).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "cnt",
        "sum_qty",
    )
    return with_sql_empty_grand_total(rolled, grand).orderBy(
        F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
    )


@register(
    "d_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
  round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    tags=("D4",),
)
def d_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: full cross-dimensional subtotals (all 4 grouping sets)."""
    o = load_table(spark, sf_dir, "orders")
    cubed = o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )
    grand = o.agg(
        F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("total")
    ).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "cnt",
        "total",
    )
    return with_sql_empty_grand_total(cubed, grand).orderBy(
        F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
    )


@register(
    "d_percentile_median",
    oracle="""
SELECT l_returnflag,
  round(median(l_extendedprice), 6) AS med_price,
  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("D5",),
)
def d_percentile_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: exact median + continuous quantiles (exact forms so the
    oracle hash matches; approx_percentile registered rows-only)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_extendedprice"), 6).alias("med_price"),
            F.round(F.percentile("l_extendedprice", F.lit(0.25)), 6).alias("p25"),
            F.round(F.percentile("l_extendedprice", F.lit(0.75)), 6).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d_collect_list_set",
    oracle="""
SELECT n_regionkey,
  -- coalesce like Spark's concat_ws over a null-skipped collect_list:
  -- an all-NULL group serializes to '', not NULL
  coalesce(array_to_string(list_sort(
    list(n_name) FILTER (WHERE n_name IS NOT NULL)), '|'), '') AS names,
  coalesce(array_to_string(list_sort(
    list(DISTINCT substring(n_name, 1, 1))
      FILTER (WHERE n_name IS NOT NULL)), '|'), '') AS initials
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
    tags=("D6", "H5"),
)
def d_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: group→array (collect_list/collect_set), array_sort'ed for
    determinism then serialized with '|' — the driver's value-hash
    cannot hash list cells (round-1 harness crash), so no registered
    query may emit an array-typed output column."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("n_name"))).alias("names"),
            F.concat_ws(
                "|", F.array_sort(F.collect_set(F.substring("n_name", 1, 1)))
            ).alias("initials"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "d_min_max_by",
    oracle="""
SELECT o_orderpriority,
  -- composite (cents, key) argmax key packed into 128-bit: the old
  -- int64 `cents * 1e7 + key` overflowed at ~$92B and silently
  -- mis-ranked once keys reached 1e7; HUGEINT×1e16 is exact for
  -- cents ≤ 1e22 and keys < 1e16 (covers 2^53 ids)
  max_by(o_orderkey,
         CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
           * 10000000000000000 + o_orderkey)
    AS biggest_order,
  min_by(o_orderkey,
         CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS HUGEINT)
           * 10000000000000000 + o_orderkey)
    AS smallest_order,
  round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("D7",),
)
def d_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: argmax/argmin per group. The argmax key is the composite
    (cents, orderkey) packed into one 128-bit integer so ties on price
    (e.g. a zero-variance feed) break on the key identically in both
    engines — DuckDB's max_by cannot order by a struct, so the packed
    form is the shared total order. Packed in DECIMAL(38,0)/HUGEINT,
    not int64: the 64-bit packing overflowed at ~$92B and silently
    mis-ranked once order keys reached the 1e7 stride (the extremes
    fixture's 2^53 ids caught both)."""
    o = load_table(spark, sf_dir, "orders")
    ckey = (
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .cast("decimal(38,0)")
        * F.lit(10_000_000_000_000_000).cast("decimal(38,0)")
        + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", ckey).alias("biggest_order"),
            F.min_by("o_orderkey", ckey).alias("smallest_order"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "d_numeric_stats",
    oracle="""
SELECT l_returnflag,
  round(stddev_samp(l_extendedprice), 4) AS sd_price,
  round(var_samp(l_quantity), 4) AS var_qty,
  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("D8",),
)
def d_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: sample stddev/variance/correlation per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            # covar/(sd·sd) with try_divide, NOT builtin corr: Spark's
            # corr ABORTS under ANSI on a zero-variance group where
            # DuckDB's returns NULL — the explicit form is the same
            # statistic with SQL-null semantics
            F.round(
                F.try_divide(
                    F.covar_samp("l_extendedprice", "l_quantity"),
                    F.stddev_samp("l_extendedprice")
                    * F.stddev_samp("l_quantity"),
                ),
                6,
            ).alias("corr_pq"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d_approx_count_distinct",
    oracle="""
SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_ndp,
  TRUE AS ok
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("D3",),
)
def d_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: HyperLogLog++ distinct estimate — the 100-TB path where exact
    distinct's shuffle is the bottleneck. Estimator internals differ
    from DuckDB's by design, so the query emits the exact count plus
    ok = |approx − exact|/exact ≤ 5% computed in-plan; the oracle
    reproduces exact + TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_ndp"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_ndp"),
        )
        .select(
            "l_returnflag",
            "exact_ndp",
            (
                F.abs(F.col("approx_ndp") - F.col("exact_ndp"))
                / F.col("exact_ndp")
                <= 0.05
            ).alias("ok"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# F. sort / limit / top-k
# --------------------------------------------------------------------------


@register(
    "f_sort_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50 OFFSET 10
""",
    tags=("F1", "F2", "F3"),
)
def f_sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: multi-key global sort with LIMIT/OFFSET pagination;
    unique o_orderkey tie-break keeps the page boundaries exact."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(50)
    )


# --------------------------------------------------------------------------
# G. set operations & dedup
# --------------------------------------------------------------------------


@register(
    "g_union_append",
    oracle="""
SELECT month, count(*) AS cnt FROM (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month FROM orders
  WHERE o_orderdate < TIMESTAMP '1996-01-01'
  UNION ALL
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
) GROUP BY month ORDER BY month
""",
    tags=("G1",),
)
def g_union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: monthly-batch append via unionByName (the reference's
    incremental monthly load)."""
    o = load_table(spark, sf_dir, "orders")
    before = o.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    after = o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    month = F.date_trunc("month", "o_orderdate").alias("month")
    return (
        before.select(month)
        .unionByName(after.select(month), allowMissingColumns=True)
        .groupBy("month")
        .agg(F.count("*").alias("cnt"))
        .orderBy("month")
    )


@register(
    "g_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
""",
    tags=("G2",),
)
def g_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: set intersection (distinct semantics)."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b).orderBy("o_custkey")


@register(
    "g_except",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
ORDER BY c_custkey
""",
    tags=("G2",),
)
def g_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: set difference (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    return (
        c.select("c_custkey")
        .subtract(o.select(F.col("o_custkey").alias("c_custkey")))
        .orderBy("c_custkey")
    )


@register(
    "g_dedup_exact",
    oracle="""
SELECT DISTINCT l_orderkey, l_partkey, l_suppkey
FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)
ORDER BY l_orderkey, l_partkey, l_suppkey
""",
    tags=("G3",),
)
def g_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: exact dedup over overlapping extracts — double the input via
    union (simulating re-delivered batches), dropDuplicates on the key.
    Full-key dedup ⇒ survivor nondeterminism can't leak into output."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    doubled = li.unionByName(li)
    return doubled.dropDuplicates(["l_orderkey", "l_partkey", "l_suppkey"]).orderBy(
        "l_orderkey", "l_partkey", "l_suppkey"
    )


@register(
    "g_dedup_keep_first",
    oracle="""
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity FROM (
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    row_number() OVER (PARTITION BY l_orderkey, l_partkey
                       ORDER BY l_linenumber, l_suppkey) AS rn
  FROM lineitem
) WHERE rn = 1 ORDER BY l_orderkey, l_partkey
""",
    tags=("G3", "E1"),
)
def g_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 deterministic-survivor variant: keep-first-by-tiebreak dedup
    via row_number — the pattern to use whenever the survivor's other
    columns matter (dropDuplicates picks an arbitrary row)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey", "l_partkey").orderBy("l_linenumber", "l_suppkey")
    return (
        li.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("l_orderkey", "l_partkey")
    )


@register(
    "f_sample",
    oracle="""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
  TRUE AS ok_cnt, TRUE AS ok_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("F", "B3"),
)
def f_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sampling — the standard corpus down-sampling
    step of a training-data pipeline. Deterministic within Spark
    (seed=42) but engine-specific RNG, so the query emits per-group
    invariants computed in-plan: the sampled row fraction and quantity
    fraction both within [0.05, 0.15] of the 0.1 target (≥12σ margin
    at gate scale); the oracle reproduces group totals + TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_total"), F.sum("l_quantity").alias("qty_total")
    )
    sampled = (
        li.sample(fraction=0.1, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_samp"), F.sum("l_quantity").alias("qty_samp"))
    )
    frac_c = F.try_divide(F.coalesce(F.col("n_samp"), F.lit(0)), F.col("n_total"))
    frac_q = F.try_divide(F.col("qty_samp"), F.col("qty_total"))
    # below ~100 rows/group, binomial noise swamps the ±0.05 band — the
    # invariant is vacuously satisfied (LEFT join: a group whose sample
    # came up empty must still report, not vanish)
    small = F.col("n_total") < 100
    return (
        totals.join(sampled, "l_returnflag", "left")
        .select(
            "l_returnflag",
            "n_total",
            (small | ((frac_c >= 0.05) & (frac_c <= 0.15))).alias("ok_cnt"),
            (
                small
                | F.coalesce((frac_q >= 0.05) & (frac_q <= 0.15), F.lit(False))
            ).alias("ok_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    tags=("D4",),
)
def d_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: explicit GROUPING SETS (not derivable from rollup/cube —
    arbitrary set list) via the SQL surface; Catalyst lowers it to the
    same Expand + aggregate as rollup."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@register(
    "d_unpivot",
    oracle="""
SELECT l_returnflag, metric, round(val, 2) AS val FROM (
  SELECT l_returnflag, 'sum_qty' AS metric, sum(l_quantity) AS val
  FROM lineitem GROUP BY l_returnflag
  UNION ALL
  SELECT l_returnflag, 'sum_price' AS metric, sum(l_extendedprice) AS val
  FROM lineitem GROUP BY l_returnflag
)
ORDER BY l_returnflag, metric
""",
    tags=("D4", "G1"),
)
def d_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of d_pivot): wide per-group metrics →
    long (group, metric, value) — df.unpivot lowers to the same Expand
    node as the UNION ALL the oracle spells out."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_price"),
    )
    return (
        wide.unpivot("l_returnflag", ["sum_qty", "sum_price"], "metric", "val")
        .withColumn("val", F.round("val", 2))
        .orderBy("l_returnflag", "metric")
    )


@register(
    "d_profile_columns",
    oracle="""
SELECT 'o_custkey' AS col, count(*) - count(o_custkey) AS n_nulls,
       count(DISTINCT o_custkey) AS n_distinct,
       min(o_custkey) AS min_i, max(o_custkey) AS max_i FROM orders
UNION ALL
SELECT 'o_orderdate', count(*) - count(o_orderdate),
       count(DISTINCT o_orderdate),
       CAST(min(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT),
       CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderkey', count(*) - count(o_orderkey),
       count(DISTINCT o_orderkey),
       min(o_orderkey), max(o_orderkey) FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority), NULL, NULL FROM orders
UNION ALL
SELECT 'o_totalprice', count(*) - count(o_totalprice),
       count(DISTINCT o_totalprice),
       CAST(round(min(o_totalprice) * 100) AS BIGINT),
       CAST(round(max(o_totalprice) * 100) AS BIGINT) FROM orders
ORDER BY col
""",
    tags=("D1", "D2", "B5"),
)
def d_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling ('ANALYZE TABLE' composite): per-column null
    count, distinct count, and min/max on a per-type integer encoding
    (identity for keys, epoch days for dates, exact cents for money,
    absent for free text — integer encodings because cross-engine
    float/date→string formatting is not hash-stable). ONE scan: a
    single multi-aggregate row exploded into per-column rows in-plan;
    the multiple count(DISTINCT) trigger Spark's expand-based
    multi-distinct rewrite, which partial-aggregates before the
    shuffle."""
    o = load_table(spark, sf_dir, "orders")
    a = o.agg(
        F.count("*").alias("n"),
        # o_custkey
        F.count("o_custkey").alias("nn_ck"),
        F.countDistinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").alias("mn_ck"),
        F.max("o_custkey").alias("mx_ck"),
        # o_orderdate
        F.count("o_orderdate").alias("nn_od"),
        F.countDistinct("o_orderdate").alias("nd_od"),
        # TZ-free epoch-day encoding: NTZ->date cast + datediff (the
        # fixtures carry TIMESTAMP_NTZ; unix_micros would need a TZ)
        F.min(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        ).cast("long").alias("mn_od"),
        F.max(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        ).cast("long").alias("mx_od"),
        # o_orderkey
        F.count("o_orderkey").alias("nn_ok"),
        F.countDistinct("o_orderkey").alias("nd_ok"),
        F.min("o_orderkey").alias("mn_ok"),
        F.max("o_orderkey").alias("mx_ok"),
        # o_orderpriority
        F.count("o_orderpriority").alias("nn_op"),
        F.countDistinct("o_orderpriority").alias("nd_op"),
        # o_totalprice
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct("o_totalprice").alias("nd_tp"),
        (F.round(F.min("o_totalprice") * 100)).cast("long").alias("mn_tp"),
        (F.round(F.max("o_totalprice") * 100)).cast("long").alias("mx_tp"),
    )
    row = F.struct
    melted = a.select(
        F.explode(
            F.array(
                row(
                    F.lit("o_custkey").alias("col"),
                    (F.col("n") - F.col("nn_ck")).alias("n_nulls"),
                    F.col("nd_ck").alias("n_distinct"),
                    F.col("mn_ck").cast("long").alias("min_i"),
                    F.col("mx_ck").cast("long").alias("max_i"),
                ),
                row(
                    F.lit("o_orderdate").alias("col"),
                    (F.col("n") - F.col("nn_od")).alias("n_nulls"),
                    F.col("nd_od").alias("n_distinct"),
                    F.col("mn_od").cast("long").alias("min_i"),
                    F.col("mx_od").cast("long").alias("max_i"),
                ),
                row(
                    F.lit("o_orderkey").alias("col"),
                    (F.col("n") - F.col("nn_ok")).alias("n_nulls"),
                    F.col("nd_ok").alias("n_distinct"),
                    F.col("mn_ok").cast("long").alias("min_i"),
                    F.col("mx_ok").cast("long").alias("max_i"),
                ),
                row(
                    F.lit("o_orderpriority").alias("col"),
                    (F.col("n") - F.col("nn_op")).alias("n_nulls"),
                    F.col("nd_op").alias("n_distinct"),
                    F.lit(None).cast("long").alias("min_i"),
                    F.lit(None).cast("long").alias("max_i"),
                ),
                row(
                    F.lit("o_totalprice").alias("col"),
                    (F.col("n") - F.col("nn_tp")).alias("n_nulls"),
                    F.col("nd_tp").alias("n_distinct"),
                    F.col("mn_tp").alias("min_i"),
                    F.col("mx_tp").alias("max_i"),
                ),
            )
        ).alias("p")
    )
    return melted.select("p.*").orderBy("col")
