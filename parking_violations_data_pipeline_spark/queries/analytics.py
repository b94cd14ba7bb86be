"""Product-analytics composites over the events stream table.

The reporting queries every analytics engine ends up running: cohort
retention, conversion funnel, cumulative-distinct growth. Each is a
composition of already-covered primitives (D1 aggregation, E-family
windows, H2 datetime) — registered because the *composition* is what
users port between engines, and each has a classic wrong-shuffle
trap the plan must avoid (noted per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_cohort_retention",
    oracle="""
WITH firstweek AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST((CAST(date_trunc('week', e.ts) AS DATE) - CAST(f.cohort_week AS DATE)) // 7
            AS BIGINT) AS week_offset,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN firstweek f ON e.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("D1", "D2", "H2", "E2"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active week, activity
    counted per (cohort, week-offset). The cohort table is tiny
    (one row per user) so it broadcasts back onto events — the big
    table is shuffled once, for the final (cohort, offset) distinct
    aggregate. Week offset is integer day arithmetic (both engines
    truncate weeks to Monday; the DATE cast keeps it TZ-free)."""
    ev = load_table(spark, sf_dir, "events")
    firstweek = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(maybe_broadcast(firstweek, sf_dir, "events"), "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'signup'
  GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.t0 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s) AS n_signup,
       (SELECT count(*) FROM c) AS n_click_after,
       (SELECT count(*) FROM p) AS n_purchase_after
""",
    tags=("D1", "C1", "B6", "H2"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: signup → first later click → first
    later purchase, strictly time-ordered per user. Three per-user
    min-aggregates chained by broadcast joins of the (small) per-user
    stage tables — events is scanned per stage but never
    self-joined row×row (the naive funnel query is a triple self-join
    that explodes on active users)."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(maybe_broadcast(s, sf_dir, "events"), "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(maybe_broadcast(c, sf_dir, "events"), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after")))
    )


@register(
    "e_cumulative_distinct",
    oracle="""
WITH firstday AS (
  SELECT user_id, CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS d
  FROM events GROUP BY user_id
), daily AS (
  SELECT d, count(*) AS new_users FROM firstday GROUP BY d
)
SELECT d, new_users,
       CAST(sum(new_users) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM daily ORDER BY d
""",
    tags=("D2", "E3", "H2"),
)
def e_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count by first-seen hour — the streaming-dashboard
    classic. Rewritten from 'count distinct up to each day' (which
    needs O(days × users) state) to first-seen-hour + cumulative sum:
    one per-user aggregate, one tiny per-hour frame, one ordered
    window over hour rows only."""
    ev = load_table(spark, sf_dir, "events")
    firstday = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("d")
    )
    daily = firstday.groupBy("d").agg(F.count("*").alias("new_users"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "d", "new_users", F.sum("new_users").over(w).alias("cum_users")
    ).orderBy("d")


@register(
    "q_customer_deciles",
    oracle="""
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT *, ntile(10) OVER (ORDER BY total_spend, o_custkey) AS decile
  FROM spend
)
SELECT decile, count(*) AS n_customers,
       round(sum(total_spend), 2) AS decile_spend,
       round(min(total_spend), 2) AS min_spend,
       round(max(total_spend), 2) AS max_spend,
       CAST(sum(n_orders) AS BIGINT) AS n_orders
FROM ranked GROUP BY decile ORDER BY decile
""",
    tags=("E1", "D1", "B6"),
)
def q_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend deciles (the RFM/BI classic): per-customer order
    totals, ntile(10) with the FULL tie-break (spend, custkey — ntile
    splits equal values across bucket boundaries, so the secondary
    key is what makes the bucketing engine-portable), then per-decile
    spend/min/max/order-count. One shuffle for the per-customer agg;
    the ntile runs over the (much smaller) customer frame."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.count("*").alias("n_orders"),
    )
    w = W.orderBy("total_spend", "o_custkey")
    return (
        spend.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("total_spend"), 2).alias("decile_spend"),
            F.round(F.min("total_spend"), 2).alias("min_spend"),
            F.round(F.max("total_spend"), 2).alias("max_spend"),
            F.sum("n_orders").alias("n_orders"),
        )
        .orderBy("decile")
    )


@register(
    "q_basket_pairs",
    oracle="""
WITH pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, count(*) AS n_baskets
FROM pairs GROUP BY part_a, part_b
ORDER BY n_baskets DESC, part_a, part_b LIMIT 20
""",
    tags=("C1", "D1", "F3"),
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top-20 with full tie-break. The self-join shuffles on
    l_orderkey and the pair blow-up is bounded by lines-per-order
    (~7), so work is O(orders x lines²-per-order), never corpus² —
    the same bounded-group shape as the session and dedup operators."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = a.join(b, "l_orderkey").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_baskets"))
        .orderBy(F.desc("n_baskets"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "q_pareto_80",
    oracle="""
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS s
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT s, sum(s) OVER (ORDER BY s DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(s) OVER () AS total
  FROM spend
)
SELECT count(*) AS n_total_customers,
       CAST(sum(CASE WHEN cum - s < total * 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_customers_to_80pct
FROM ranked
""",
    tags=("E3", "D1", "F1"),
)
def q_pareto_80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: how many top customers (by spend, full
    tie-break) cover 80% of revenue — counted as customers whose
    cumulative share BEFORE their own spend is still under the
    threshold (closed-form, no iteration). The running sum orders the
    small per-customer frame; the big table is touched once."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("s")
    )
    w = W.orderBy(F.desc("s"), "o_custkey").rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy()
    ranked = spend.select(
        "s",
        F.sum("s").over(w).alias("cum"),
        F.sum("s").over(wt).alias("total"),
    )
    return ranked.agg(
        F.count("*").alias("n_total_customers"),
        # when/otherwise(0), matching the oracle's CASE … ELSE 0: an
        # all-NULL spend column must count 0, not propagate NULL
        F.sum(
            F.when((F.col("cum") - F.col("s")) < F.col("total") * 0.8, 1)
            .otherwise(0)
            .cast("long")
        ).alias("n_customers_to_80pct"),
    )
