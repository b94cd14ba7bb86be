"""Round-4 widening batch 79: Spearman rank correlation with a fully
integer certificate (completing the correlation family: Pearson D8,
Kendall, now Spearman) and the repeat-purchase frequency curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_spearman_rho",
    oracle="""
WITH spend AS (
  SELECT c.c_custkey,
    CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
    coalesce(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)), 0)
      AS spend_cents
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, bal_cents
),
r AS (
  SELECT
    row_number() OVER (ORDER BY bal_cents, c_custkey) AS rx,
    row_number() OVER (ORDER BY spend_cents, c_custkey) AS ry,
    count(*) OVER () AS n
  FROM spend
),
s AS (
  SELECT max(n) AS n, sum((rx - ry) * (rx - ry)) AS d2 FROM r
)
SELECT
  CAST(n AS BIGINT) AS n,
  CAST(d2 AS BIGINT) AS sum_d2,
  CAST(n * (n * n - 1) AS BIGINT) AS denom6,
  (6 * d2) * 4 < n * (n * n - 1) * 2 AS strong_positive
FROM s
""",
    tags=("D8", "E1"),
)
def d_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance
    and their lifetime spend. ρ = 1 − 6·Σd²/(n(n²−1)) never
    materializes as a double: the query emits the exact integer pieces
    (Σd², n(n²−1)) plus the cross-multiplied verdict ρ > 1/2 ⟺
    6·Σd²·4 < n(n²−1)·2 — bit-exact cross-engine. Ranks are made
    deterministic under ties by full-key (value, custkey) row_number
    — the documented rank-exact convention. Scale shape: one join +
    aggregate, then two global rank windows over the customer frame
    (n = customers, far smaller than the fact table); at 100 TB the
    global sort for ranking is the unavoidable cost of exact ranks
    and runs as a range-partitioned sort, not a single-task sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(
            c["c_custkey"].alias("ck"),
            F.round(c["c_acctbal"] * 100, 0).cast("long").alias("bal_cents"),
        )
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")),
                F.lit(0),
            ).alias("spend_cents")
        )
    )
    r = spend.select(
        F.row_number().over(Window.orderBy("bal_cents", "ck")).alias("rx"),
        F.row_number().over(Window.orderBy("spend_cents", "ck")).alias("ry"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    s = r.agg(
        F.max("n").alias("n"),
        F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))).alias("d2"),
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.col("d2").cast("long").alias("sum_d2"),
        (F.col("n") * (F.col("n") * F.col("n") - 1)).cast("long").alias("denom6"),
        (
            (F.lit(6) * F.col("d2")) * 4
            < F.col("n") * (F.col("n") * F.col("n") - 1) * 2
        ).alias("strong_positive"),
    )


@register(
    "q_repeat_purchase_curve",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
),
lv AS (SELECT unnest(range(1, 6)) AS at_least)
SELECT CAST(at_least AS BIGINT) AS at_least,
  CAST((SELECT count(*) FROM per_cust WHERE n_orders >= at_least) AS BIGINT)
    AS n_customers,
  CAST((SELECT count(*) FROM per_cust WHERE n_orders >= at_least) * 1000000
       // (SELECT count(*) FROM per_cust) AS BIGINT) AS share_ppm
FROM lv ORDER BY at_least
""",
    tags=("D1", "H5"),
)
def q_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase curve: the share of customers with ≥1..≥5
    orders — the loyalty funnel every retention team tracks. Computed
    without five scans: one per-customer count, then each customer row
    fans out to the thresholds it satisfies (explode over a ≤5-element
    sequence) and one aggregate counts every level; shares in integer
    ppm. The level table is a constant — the plan is scan → agg →
    generate → agg, all partial/final."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    total = per_cust.count()
    hit = (
        per_cust.filter(F.col("n_orders") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.least(F.col("n_orders"), F.lit(5)))
            ).alias("at_least")
        )
        .groupBy("at_least")
        .agg(F.count("*").alias("n_customers"))
    )
    levels = per_cust.sparkSession.range(1, 6).select(
        F.col("id").cast("int").alias("at_least")
    )
    return (
        levels.join(hit, "at_least", "left")
        .select(
            F.col("at_least").cast("long").alias("at_least"),
            F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
            # zero customers → NULL share (DuckDB // 0 is NULL, not an
            # ANSI abort)
            (
                F.expr(f"coalesce(n_customers, 0) * 1000000 div {total}")
                if total > 0
                else F.lit(None).cast("long")
            ).alias("share_ppm"),
        )
        .orderBy("at_least")
    )
