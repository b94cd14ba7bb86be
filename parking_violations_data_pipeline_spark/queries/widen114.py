"""Round-4 widening batch 114: time-underwater — how LONG the
cumulative revenue curve stays below its prior peak (the duration
companion to e_max_drawdown's depth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "e_underwater_duration",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
    sum(CASE WHEN event_type = 'purchase'
        THEN CAST(round(value * 100, 0) AS BIGINT)
        ELSE -CAST(round(value * 100, 0) AS BIGINT) END) AS net
  FROM events WHERE value > 0 GROUP BY d
),
curve AS (
  SELECT d, sum(net) OVER (ORDER BY d) AS cum FROM daily
),
uw AS (
  SELECT d, cum,
    max(cum) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS peak,
    CASE WHEN cum < max(cum) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
         PRECEDING AND CURRENT ROW) THEN 1 ELSE 0 END AS under
  FROM curve
),
islands AS (
  SELECT d, under,
    sum(CASE WHEN under = 0 THEN 1 ELSE 0 END)
      OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS grp
  FROM uw
),
spans AS (
  SELECT grp, count(*) AS days_under FROM islands WHERE under = 1 GROUP BY grp
)
SELECT
  CAST((SELECT count(*) FROM uw) AS BIGINT) AS n_days,
  CAST((SELECT coalesce(sum(under), 0) FROM uw) AS BIGINT)
    AS days_underwater,
  CAST(coalesce(max(days_under), 0) AS BIGINT) AS longest_underwater,
  CAST((SELECT count(*) FROM spans) AS BIGINT) AS n_underwater_spells
FROM spans
""",
    tags=("E3", "E2"),
)
def e_underwater_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-underwater: treating purchases as inflows and all other
    event values as outflows, the cumulative curve is compared to its
    RUNNING PEAK; a day is 'underwater' while the curve sits below
    that peak. e_max_drawdown measures how DEEP the dips go — this
    measures how LONG they last (the recovery-time metric risk desks
    quote beside depth), via the running max + gaps-and-islands grain:
    spells of consecutive underwater days, their count and the
    longest. One global date ordering drives every window (daily
    grain — tiny after the first rollup)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(-cents)
        ).alias("net")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = daily.select("d", F.sum("net").over(w).alias("cum"))
    uw = curve.select(
        "d",
        F.when(F.col("cum") < F.max("cum").over(w), 1).otherwise(0).alias(
            "under"
        ),
    )
    islands = uw.withColumn(
        "grp", F.sum(F.when(F.col("under") == 0, 1).otherwise(0)).over(w)
    )
    spans = (
        islands.filter(F.col("under") == 1)
        .groupBy("grp")
        .agg(F.count("*").alias("days_under"))
    )
    return (
        uw.agg(
            F.count("*").alias("n_days"),
            F.coalesce(F.sum("under"), F.lit(0)).alias("days_underwater"),
        )
        .crossJoin(
            spans.agg(
                F.coalesce(F.max("days_under"), F.lit(0)).alias(
                    "longest_underwater"
                ),
                F.count("*").alias("n_underwater_spells"),
            )
        )
        .select(
            "n_days", "days_underwater", "longest_underwater",
            "n_underwater_spells",
        )
    )
