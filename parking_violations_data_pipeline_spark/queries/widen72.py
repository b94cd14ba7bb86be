"""Round-3 widening batch 73 (session finale): time-to-milestone —
the first moment each user's cumulative spend crosses a threshold,
and the distribution of those crossing times (the activation-speed
metric growth teams optimize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_time_to_milestone",
    oracle="""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
cum AS (
  SELECT user_id, us, cents,
    sum(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
    min(us) OVER (PARTITION BY user_id) AS first_us
  FROM p
),
crossings AS (
  SELECT user_id, min(us - first_us) AS tt_us
  FROM cum WHERE c >= 50000
  GROUP BY user_id
),
ranked AS (
  SELECT tt_us,
    row_number() OVER (ORDER BY tt_us, user_id) AS rn,
    count(*) OVER () AS n
  FROM crossings
)
SELECT
  CAST(max(n) AS BIGINT) AS n_achievers,
  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN tt_us END) // 3600000000 AS BIGINT)
    AS median_hours,
  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN tt_us END) // 3600000000 AS BIGINT)
    AS p90_hours
FROM ranked
""",
    tags=("E3", "D5", "D1"),
)
def q_time_to_milestone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-milestone: the first instant each user's cumulative
    purchases cross $500, measured from their first purchase — the
    activation-speed distribution (median / p90 hours) growth teams
    tune onboarding against. The crossing is min(time) over rows
    whose RUNNING SUM has passed the threshold — one user-ordered
    window (running cents and first-timestamp share the partition),
    then rank-exact percentiles over the per-user crossing times.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    p = e.select(
        "user_id",
        epoch_us("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_user = Window.partitionBy("user_id")
    cum = p.select(
        "user_id",
        "us",
        F.sum("cents").over(w_cum).alias("c"),
        F.min("us").over(w_user).alias("first_us"),
    )
    crossings = (
        cum.filter(F.col("c") >= 50000)
        .groupBy("user_id")
        .agg(F.min(F.col("us") - F.col("first_us")).alias("tt_us"))
    )
    ranked = crossings.select(
        "tt_us",
        F.row_number().over(Window.orderBy("tt_us", "user_id")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").alias("n_achievers"),
        F.expr(
            "max(CASE WHEN rn = (n + 1) div 2 THEN tt_us END) div 3600000000"
        ).alias("median_hours"),
        F.expr(
            "max(CASE WHEN rn = (9 * n + 9) div 10 THEN tt_us END) div 3600000000"
        ).alias("p90_hours"),
    )
