"""Round-3 widening batch 38: robust trend estimation (Theil-Sen
median slope over bounded pairwise slopes) and statistical process
control (p-chart with decimal(38)-exact control-limit tests — the
cross-multiplied form overflows bigint, the d_partial_agg_merge
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "e_theil_sen",
    oracle="""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS d,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY d
),
slopes AS (
  SELECT a.d AS d1, b.d AS d2,
    CAST((b.y - a.y) * 1000 // (b.d - a.d) AS BIGINT) AS slope_milli
  FROM daily a JOIN daily b ON a.d < b.d
),
ranked AS (
  SELECT slope_milli,
    row_number() OVER (ORDER BY slope_milli, d1, d2) AS rn,
    count(*) OVER () AS n
  FROM slopes
)
SELECT
  CAST(max(n) AS BIGINT) AS n_pairs,
  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN slope_milli END) AS BIGINT)
    AS theil_sen_slope_milli
FROM ranked
""",
    tags=("E3", "D8", "D5"),
)
def e_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: the median of all pairwise slopes of
    the daily purchase series — the estimator that shrugs off
    outliers OLS chases (breakdown point 29%). Pairwise work is
    bounded by the COMPRESSED series length (30 days → 435 pairs —
    time-bounded, never data-bounded); slopes land on an integer
    milli-cents-per-day grid via truncating division, and the median
    is the rank-⌈n/2⌉ element of the (slope, d1, d2) total order —
    the d_outlier_tukey discrete-quantile rule, immune to
    interpolation differences.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        e.select(
            epoch_us("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select(F.expr("us div 86400000000").alias("d"), "cents")
        .groupBy("d")
        .agg(F.sum("cents").alias("y"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(b, F.col("a.d") < F.col("b.d")).select(
        F.col("a.d").alias("d1"),
        F.col("b.d").alias("d2"),
        F.expr("(b.y - a.y) * 1000 div (b.d - a.d)").alias("slope_milli"),
    )
    ranked = slopes.select(
        "slope_milli",
        F.row_number().over(Window.orderBy("slope_milli", "d1", "d2")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").alias("n_pairs"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("slope_milli"))
        ).alias("theil_sen_slope_milli"),
    )


@register(
    "q_returns_p_chart",
    oracle="""
WITH monthly AS (
  SELECT year(l_shipdate) * 12 + month(l_shipdate) - 1 AS m,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS x
  FROM lineitem GROUP BY m
),
pooled AS (
  SELECT CAST(sum(n) AS BIGINT) AS big_n, CAST(sum(x) AS BIGINT) AS big_p
  FROM monthly
),
tested AS (
  SELECT m.m, m.n, m.x,
    CAST(m.x * 1000000 // m.n AS BIGINT) AS rate_ppm,
    CASE WHEN
      CAST(m.x AS DECIMAL(38, 0)) * p.big_n - CAST(p.big_p AS DECIMAL(38, 0)) * m.n != 0
      AND (CAST(m.x AS DECIMAL(38, 0)) * p.big_n - CAST(p.big_p AS DECIMAL(38, 0)) * m.n)
        * (CAST(m.x AS DECIMAL(38, 0)) * p.big_n - CAST(p.big_p AS DECIMAL(38, 0)) * m.n)
        > CAST(9 AS DECIMAL(38, 0)) * p.big_p * (p.big_n - p.big_p) * m.n
    THEN 1 ELSE 0 END AS out_of_control
  FROM monthly m CROSS JOIN pooled p
)
SELECT
  CAST(count(*) AS BIGINT) AS n_months,
  CAST(sum(out_of_control) AS BIGINT) AS n_ooc,
  CAST(min(rate_ppm) AS BIGINT) AS min_rate_ppm,
  CAST(max(rate_ppm) AS BIGINT) AS max_rate_ppm
FROM tested
""",
    tags=("D8", "D1", "B6"),
)
def q_returns_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control p-chart on monthly return rates:
    a month is out-of-control when its rate leaves the pooled ±3σ
    binomial band — tested WITHOUT floating point via the
    cross-multiplied inequality (x·N − P·n)² > 9·P·(N−P)·n, whose
    squared term exceeds bigint range (measured ~10²⁰ at sf0.1), so
    both sides evaluate it in DECIMAL(38,0) / HUGEINT — the
    d_partial_agg_merge wide-integer precedent. The pooled totals
    broadcast as a single row.
    """
    l = load_table(spark, sf_dir, "lineitem")
    m = (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("m")
    monthly = (
        l.select(m, F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("r"))
        .groupBy("m")
        .agg(F.count("*").alias("n"), F.sum("r").alias("x"))
    )
    pooled = monthly.agg(
        F.sum("n").alias("big_n"), F.sum("x").alias("big_p")
    )
    dev = (
        F.col("x").cast("decimal(38,0)") * F.col("big_n")
        - F.col("big_p").cast("decimal(38,0)") * F.col("n")
    )
    bound = (
        F.lit(9).cast("decimal(38,0)")
        * F.col("big_p")
        * (F.col("big_n") - F.col("big_p"))
        * F.col("n")
    )
    tested = monthly.crossJoin(F.broadcast(pooled)).select(
        "m",
        "n",
        "x",
        F.expr("x * 1000000 div n").alias("rate_ppm"),
        F.when((dev != 0) & (dev * dev > bound), 1).otherwise(0).alias("out_of_control"),
    )
    return tested.agg(
        F.count("*").alias("n_months"),
        F.sum("out_of_control").alias("n_ooc"),
        F.min("rate_ppm").alias("min_rate_ppm"),
        F.max("rate_ppm").alias("max_rate_ppm"),
    )
