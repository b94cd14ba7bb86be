"""Round-3 widening batch 72: paired t-test (per-brand yearly
revenue deltas — the matched-pairs design that removes brand-level
variance) and the brand market-entry curve (first-seen accumulation
at entity grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_ttest_paired",
    oracle="""
WITH yr AS (
  SELECT p.p_brand AS brand, year(l.l_shipdate) AS y,
    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN (1997, 1998)
  GROUP BY brand, y
),
pairs AS (
  SELECT brand,
    max(CASE WHEN y = 1998 THEN cents END) - max(CASE WHEN y = 1997 THEN cents END) AS d
  FROM yr GROUP BY brand
  HAVING max(CASE WHEN y = 1997 THEN cents END) IS NOT NULL
     AND max(CASE WHEN y = 1998 THEN cents END) IS NOT NULL
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    CAST(sum(d) AS BIGINT) AS s1,
    CAST(sum(d * d) AS BIGINT) AS s2
  FROM pairs
)
SELECT n, s1 AS sum_delta_cents,
  round((CAST(s1 AS DOUBLE) / n)
    / sqrt((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
           / (n - 1)), 6) AS t_stat
FROM s
""",
    tags=("D8",),
)
def d_ttest_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired t-test on per-brand 1997→1998 revenue deltas: the
    matched-pairs design that removes between-brand variance from
    the year effect (an unpaired test — d_ttest_welch's shape —
    would drown the signal in brand size differences). Deltas are
    exact integer cents; sufficient statistics accumulate as bigints
    and the closed form evaluates once in an identical double
    sequence, one shared round (the d_ttest_welch discipline).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    y = F.year("l_shipdate")
    yr = (
        l.filter(y.isin(1997, 1998))
        .join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), y.alias("y"))
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"))
    )
    pairs = (
        yr.groupBy("brand")
        .agg(
            F.max(F.when(F.col("y") == 1997, F.col("cents"))).alias("c97"),
            F.max(F.when(F.col("y") == 1998, F.col("cents"))).alias("c98"),
        )
        .filter(F.col("c97").isNotNull() & F.col("c98").isNotNull())
        .select((F.col("c98") - F.col("c97")).alias("d"))
    )
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.expr("d * d")).alias("s2"),
    )
    return s.select(
        "n",
        F.col("s1").alias("sum_delta_cents"),
        F.round(
            (F.col("s1").cast("double") / F.col("n"))
            / F.sqrt(
                (
                    F.col("s2").cast("double") / F.col("n")
                    - (F.col("s1").cast("double") / F.col("n"))
                    * (F.col("s1").cast("double") / F.col("n"))
                )
                / (F.col("n") - 1)
            ),
            6,
        ).alias("t_stat"),
    )


@register(
    "q_brand_entry_curve",
    oracle="""
WITH firsts AS (
  SELECT p.p_brand AS brand,
    min(year(l.l_shipdate) * 4 + (month(l.l_shipdate) - 1) // 3) AS first_q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY brand
),
per_q AS (
  SELECT first_q AS q, CAST(count(*) AS BIGINT) AS n_new FROM firsts GROUP BY first_q
)
SELECT CAST(q AS BIGINT) AS quarter_idx, n_new,
  CAST(sum(n_new) OVER (ORDER BY q
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_brands
FROM per_q ORDER BY quarter_idx
""",
    tags=("D1", "E3", "H2"),
)
def q_brand_entry_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-entry curve: per quarter, how many brands recorded
    their FIRST sale, and the cumulative assortment size — the
    first-seen-attribution pattern (t_vocab_growth's algebra) at
    business-entity grain, the view category planners use to see
    assortment expansion flatten. One brand-grain min() then a tiny
    prefix sum.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.year("l_shipdate") * 4 + F.expr("(month(l_shipdate) - 1) div 3")
    firsts = (
        l.join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.min(q).alias("first_q"))
    )
    per_q = firsts.groupBy(F.col("first_q").alias("quarter_idx")).agg(
        F.count("*").alias("n_new")
    )
    cum = Window.orderBy("quarter_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_q.select(
        F.col("quarter_idx").cast("long").alias("quarter_idx"),
        "n_new",
        F.sum("n_new").over(cum).alias("cum_brands"),
    ).orderBy("quarter_idx")
