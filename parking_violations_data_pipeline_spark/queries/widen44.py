"""Round-3 widening batch 45: brand-switching loyalty matrix
(per-customer yearly favorite → transition counts) and the
drill-across pattern (two fact tables reconciled through a conformed
date dimension, never joined fact-to-fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_brand_switching_matrix",
    oracle="""
WITH spend AS (
  SELECT o.o_custkey AS cust, p.p_brand AS brand, year(l.l_shipdate) AS y,
    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN (1997, 1998)
  GROUP BY cust, brand, y
),
fav AS (
  SELECT cust, y, brand FROM (
    SELECT cust, y, brand,
      row_number() OVER (PARTITION BY cust, y ORDER BY cents DESC, brand) AS rn
    FROM spend
  ) WHERE rn = 1
),
trans AS (
  SELECT a.brand AS brand_97, b.brand AS brand_98
  FROM fav a JOIN fav b ON a.cust = b.cust AND a.y = 1997 AND b.y = 1998
)
SELECT brand_97, brand_98,
  CAST(count(*) AS BIGINT) AS n_customers,
  CASE WHEN brand_97 = brand_98 THEN 'loyal' ELSE 'switched' END AS kind
FROM trans GROUP BY brand_97, brand_98
HAVING count(*) >= 3
ORDER BY n_customers DESC, brand_97, brand_98
""",
    tags=("E1", "C1", "D1"),
)
def q_brand_switching_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-switching matrix: each customer's FAVORITE brand per
    year (argmax of spend, (cents DESC, brand) total order), then
    the 1997→1998 transition counts — the loyalty/churn view that
    prices win-back campaigns. Cells under 3 customers are
    suppressed (the k-anonymity floor from t_k_anonymity, applied as
    a HAVING). The favorite computation is one (cust, brand, year)
    rollup plus a per-(cust, year) window — never a self-join at
    fact grain.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    y = F.year("l_shipdate")
    spend = (
        l.filter(y.isin(1997, 1998))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("p_brand").alias("brand"),
            y.alias("y"),
        )
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"))
    )
    w = Window.partitionBy("cust", "y").orderBy(F.desc("cents"), "brand")
    fav = spend.select("cust", "y", "brand", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") == 1
    )
    a = fav.filter(F.col("y") == 1997).select("cust", F.col("brand").alias("brand_97"))
    b = fav.filter(F.col("y") == 1998).select(
        F.col("cust").alias("cust_b"), F.col("brand").alias("brand_98")
    )
    trans = a.join(b, a.cust == F.col("cust_b"))
    return (
        trans.groupBy("brand_97", "brand_98")
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") >= 3)
        .select(
            "brand_97",
            "brand_98",
            "n_customers",
            F.when(F.col("brand_97") == F.col("brand_98"), "loyal")
            .otherwise("switched")
            .alias("kind"),
        )
        .orderBy(F.desc("n_customers"), "brand_97", "brand_98")
    )


@register(
    "c_drill_across",
    oracle="""
WITH sales AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day_id,
    CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sales_cents
  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY day_id
),
activity AS (
  SELECT epoch_us(ts) // 86400000000 AS day_id,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY day_id
),
bounds AS (
  SELECT least(coalesce((SELECT min(day_id) FROM sales), 9223372036854775807),
               coalesce((SELECT min(day_id) FROM activity), 9223372036854775807)) AS lo,
         greatest(coalesce((SELECT max(day_id) FROM sales), -9223372036854775808),
                  coalesce((SELECT max(day_id) FROM activity), -9223372036854775808)) AS hi
),
date_dim AS (
  SELECT unnest(generate_series(lo, hi)) AS day_id FROM bounds
)
SELECT CAST(d.day_id AS BIGINT) AS day_id,
  CAST(coalesce(s.n_orders, 0) AS BIGINT) AS n_orders,
  CAST(coalesce(s.sales_cents, 0) AS BIGINT) AS sales_cents,
  CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
  CAST(coalesce(a.n_users, 0) AS BIGINT) AS n_users
FROM date_dim d
LEFT JOIN sales s ON d.day_id = s.day_id
LEFT JOIN activity a ON d.day_id = a.day_id
WHERE s.day_id IS NOT NULL OR a.day_id IS NOT NULL
ORDER BY day_id
""",
    tags=("C2", "D1", "H2"),
)
def c_drill_across(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drill-across: TWO fact tables (1998 orders; events) reconciled
    through a conformed date dimension — each fact aggregates to the
    conformed grain FIRST, then the summaries outer-join on the
    dimension key. This is the multi-fact pattern (never join facts
    row-to-row: grains differ and the join would fan out); the date
    spine densifies from the observed bounds, and days absent from
    both facts are pruned so the output matches the active calendar.
    Zero-filled metrics keep the row a complete scorecard.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1998)
    e = load_table(spark, sf_dir, "events")
    sales = (
        o.select(
            epoch_us("o_orderdate").alias("ous"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
        .select(F.expr("ous div 86400000000").alias("day_id"), "cents")
        .groupBy("day_id")
        .agg(F.count("*").alias("n_orders"), F.sum("cents").alias("sales_cents"))
    )
    activity = (
        e.select(epoch_us("ts").alias("us"), "user_id")
        .select(F.expr("us div 86400000000").alias("day_id"), "user_id")
        .groupBy("day_id")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )
    bounds = (
        sales.select("day_id")
        .unionByName(activity.select("day_id"))
        .agg(F.min("day_id").alias("lo"), F.max("day_id").alias("hi"))
    )
    date_dim = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day_id")
    )
    out = (
        date_dim.join(sales, "day_id", "left")
        .join(activity, "day_id", "left")
        .filter(F.col("n_orders").isNotNull() | F.col("n_events").isNotNull())
        .select(
            F.col("day_id").cast("long").alias("day_id"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("sales_cents", F.lit(0)).alias("sales_cents"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
        )
        .orderBy("day_id")
    )
    return out
