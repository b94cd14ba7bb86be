"""TPC-H query-shape expansion (SURVEY.md §2 C/D/F families, widened).

Round-1 covered Q1/Q3/Q5/Q10/Q18; this module adds the remaining
classic shapes expressible on the driver fixtures (no partsupp table,
no commit/receipt dates — those queries are adapted to the available
star schema, keeping the plan shape that makes each one interesting):

  Q4   EXISTS decorrelation -> left-semi join with a non-equi term
  Q6   pure filter + agg (predicate-pushdown showcase)
  Q7   volume shipping: double nation-dim join + pair disjunction
  Q8   market share: conditional aggregation ratio per year
  Q9   product profit: LIKE-filtered part join, nation x year agg
  Q13  zero-preserving outer-join histogram (double aggregation)
  Q14  promo revenue: CASE ratio on a month of lineitem
  Q15  top supplier: scalar-subquery max, exact integer-unit compare
  Q16  distinct-supplier counts with a NOT IN exclusion set
  Q17  correlated avg subquery -> per-key agg + join-back filter
  Q19  disjunction-of-brackets pushdown (OR of AND-brackets)
  Q22  anti-join + global scalar threshold (exact cents compare)

Money convention: every summed product goes through functions.money
(exact 1e-4-dollar int64 grid, DECIMAL(38,0) accumulation) and the
oracle mirrors the identical integer arithmetic, so value-hashes can't
flap on summation-order ulps. Raw sums of 2-decimal money columns are
boundary-safe (see functions/money.py) and only rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.money import (
    disc_units,
    sum_disc_price,
    sum_ext_times_disc,
)
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    tags=("C4", "D1", "F1"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: ships-after-order instead of the absent
    commit/receipt dates): EXISTS over lineitem per order.

    The DataFrame form is the decorrelated plan directly — a left-semi
    join on l_orderkey with the non-equi l_shipdate > o_orderdate term
    riding along, then a tiny 5-group agg. The quarter filter pushes to
    the orders scan; the semi join shuffles only (orderkey, two dates).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT
  CAST(round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0, 2)
       AS DOUBLE) AS revenue,
  count(*) AS cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("B3", "D1"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical pushdown query — every predicate reaches
    the parquet scan (PushedFilters on l_shipdate/l_discount/
    l_quantity), nothing shuffles but one partial-agg row per task.
    Revenue = Σ price×discount on the exact 1e-4-dollar grid.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            sum_ext_times_disc().alias("revenue"),
            F.count("*").alias("cnt"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  year(l.l_shipdate) AS l_year,
  CAST(round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0, 2)
       AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("C1", "C3", "D1", "F1"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    The nation dimension joins twice (supplier side and customer side)
    — both broadcast. The pair disjunction can't pre-filter either
    nation join alone (each side admits both nations), so it's applied
    after the joins; Catalyst still prunes every non-key column early.
    One shuffle: the (supp_nation, cust_nation, year) agg.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(cn), c.c_nationkey == cn.cn_key).select(
        "c_custkey", "cust_nation"
    )
    supp = s.join(F.broadcast(sn), s.s_nationkey == sn.sn_key).select(
        "s_suppkey", "supp_nation"
    )
    j = (
        li.join(maybe_broadcast(o.join(maybe_broadcast(cust, sf_dir, "customer"), o.o_custkey == cust.c_custkey), sf_dir, "orders", "customer"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(sum_disc_price().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
SELECT o_year,
  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
        / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
    CAST(round(l.l_extendedprice * 100) AS BIGINT)
      * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS vol,
    sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
  JOIN part p     ON p.p_partkey = l.l_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    tags=("C1", "C3", "D1", "B6"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of PROMO-part revenue sold into ASIA
    customers, per order year.

    Numerator and denominator are both exact integer-unit sums
    (DECIMAL(38,0)); the ratio is one double divide per year, so both
    engines compute bit-identical shares. Every dimension broadcasts;
    lineitem is the only streamed side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cn_key")
    )
    cust = c.join(F.broadcast(cn), c.c_nationkey == cn.cn_key).select("c_custkey")
    ords = o.join(maybe_broadcast(cust, sf_dir, "customer"), o.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate"
    )
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    supp = s.join(F.broadcast(sn), s.s_nationkey == sn.sn_key).select(
        "s_suppkey", "supp_nation"
    )
    vol = disc_units().cast("decimal(38,0)")
    return (
        li.join(maybe_broadcast(ords, sf_dir, "orders", "customer"), li.l_orderkey == ords.o_orderkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT sn.n_name AS nation, year(o.o_orderdate) AS o_year,
  CAST(round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0, 2)
       AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    tags=("C1", "C3", "D1", "B4"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: profit = discounted revenue; the
    fixture has no partsupp/supplycost): revenue from '%red%' parts by
    supplier nation and order year.

    The LIKE filter prunes part before its broadcast join; orders joins
    on the fact's key. One shuffle for the (nation, year) agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(sum_disc_price().alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("C2", "D1", "F1"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, zero
    preserved — the left outer join keeps order-less customers and
    count(o_orderkey) ignores the null rows, then a second aggregation
    histograms the counts. Two shuffles (custkey, then c_count) — the
    second is over ≤ max-orders-per-customer rows, effectively free.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.0
  * CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
             ELSE 0 END) AS DOUBLE)
  / CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS DOUBLE),
  6) AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
    tags=("C1", "C3", "B6", "D1"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts.
    CASE wraps the exact per-row integer units; one broadcast join,
    one global agg, one double divide at the end.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = disc_units().cast("decimal(38,0)")
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total_units
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
  CAST(round(CAST(r.total_units AS DOUBLE) / 10000.0, 2) AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_units = (SELECT max(total_units) FROM revenue)
ORDER BY s.s_suppkey
""",
    tags=("C1", "D1", "D7"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the max quarterly revenue.

    The scalar subquery becomes a 1-row broadcast cross join against
    the per-supplier aggregate; the equality compare runs on the exact
    integer-unit sum (DECIMAL(38,0)), never on rounded doubles, so the
    max-tie set is engine-identical by construction.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_units().cast("decimal(38,0)")).alias("total_units")
    )
    mx = rev.agg(F.max("total_units").alias("max_units"))
    return (
        rev.join(F.broadcast(mx), rev.total_units == mx.max_units)
        .join(maybe_broadcast(s, sf_dir, "supplier"), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_units").cast("double") / 10000.0, 2)
            .cast("double")
            .alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_cnt",
    oracle="""
SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
""",
    tags=("C5", "D2", "B4", "F1"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: lineitem stands in for the absent
    partsupp as the part↔supplier relation; the complaints-regex
    exclusion becomes the negative-balance supplier set): distinct
    supplier counts per (brand, size).

    NOT IN over a null-free key column is a left-anti broadcast join;
    count(DISTINCT) expands to the two-phase distinct aggregate.
    """
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .join(maybe_broadcast(bad, sf_dir, "supplier"), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q17_small_qty_orders",
    oracle="""
SELECT CAST(round(sum(l.l_extendedprice) / 7.0, 2) AS DOUBLE) AS avg_yearly,
  count(*) AS cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11'
  AND l.l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
""",
    tags=("C1", "D1", "B3"),
)
def q17_small_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of one brand.

    The correlated avg subquery decorrelates into a per-part aggregate
    joined back to the fact — written that way directly. Quantities are
    integral doubles, so avg() is a ratio of exact integers and the
    0.2× threshold compare is bit-identical across engines. The
    per-part agg runs only over the brand's parts (the filter is
    applied before the join-back, cutting the shuffle ~brand-fold).
    """
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = brand_li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        brand_li.join(maybe_broadcast(avg_q, sf_dir, "part"), brand_li.l_partkey == avg_q.ap_key)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).cast("double").alias("avg_yearly"),
            F.count("*").alias("cnt"),
        )
    )


@register(
    "q19_bracket_revenue",
    oracle="""
SELECT
  CAST(round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0, 2)
       AS DOUBLE) AS revenue,
  count(*) AS cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("C1", "C3", "B4", "D1"),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: no container/shipmode columns):
    disjunction of three brand/size/quantity brackets.

    Catalyst extracts the common join key and pushes the per-table
    halves of each bracket below the join (part's brand∈{...} ∧ size
    bounds reach the part scan; quantity bounds reach lineitem); the
    cross-table residual evaluates post-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(bracket).agg(
        sum_disc_price().alias("revenue"),
        F.count("*").alias("cnt"),
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s_cents,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n.n_name, count(*) AS numcust,
  CAST(round(sum(c.c_acctbal), 2) AS DOUBLE) AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * (SELECT n FROM pos)
      > (SELECT s_cents FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n.n_name
ORDER BY n.n_name
""",
    tags=("C5", "D1", "B3"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nation instead of phone prefix,
    recency-windowed idleness instead of all-time): above-average-
    balance customers with no orders since 2000, by nation.

    The global-average threshold is compared in exact integer cents
    (bal_cents × N > Σcents) — no double division, so the boundary set
    is engine-identical. NOT EXISTS is a left-anti join against the
    date-filtered orders; the 1-row threshold broadcast-crosses in.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents).alias("s_cents"), F.count("*").alias("n")
    )
    return (
        c.join(F.broadcast(pos))
        .filter(cents * F.col("n") > F.col("s_cents"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )
