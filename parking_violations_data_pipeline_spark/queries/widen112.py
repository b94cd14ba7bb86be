"""Round-4 widening batch 112: repricing census — detecting price
CHANGES (not price levels) per part over time, the monitoring query
behind price-integrity alerts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_price_change_census",
    oracle="""
WITH monthly AS (
  SELECT l_partkey AS pk, strftime(l_shipdate, '%Y-%m') AS m,
    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
      // sum(CAST(l_quantity AS BIGINT)) AS unit_cents
  FROM lineitem WHERE l_quantity > 0
  GROUP BY pk, m
),
changes AS (
  SELECT pk, m, unit_cents,
    lag(unit_cents) OVER (PARTITION BY pk ORDER BY m) AS prev_cents
  FROM monthly
),
flagged AS (
  SELECT pk,
    CASE WHEN prev_cents IS NOT NULL AND unit_cents <> prev_cents
         THEN 1 ELSE 0 END AS changed,
    CASE WHEN prev_cents IS NOT NULL AND prev_cents > 0
         THEN abs(unit_cents - prev_cents) * 1000000 // prev_cents
         ELSE 0 END AS jump_ppm
  FROM changes
)
SELECT
  CAST(count(DISTINCT pk) AS BIGINT) AS n_parts,
  CAST(sum(changed) AS BIGINT) AS n_repricings,
  CAST(max(jump_ppm) AS BIGINT) AS max_jump_ppm,
  CAST(count(DISTINCT CASE WHEN changed = 1 THEN pk END) AS BIGINT)
    AS n_parts_repriced
FROM flagged
""",
    tags=("E2", "D1"),
)
def q_price_change_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repricing census: per part, the month-over-month UNIT price
    (integer cents ratio at month grain) compared to its previous
    month via lag — how many repricing events occurred, how many
    parts were ever repriced, and the largest single jump in ppm of
    the prior price. Price-integrity monitors alert on exactly this
    shape (a level query can't see a 40% overnight jump that lands
    back within the normal range). One part-key shuffle serves the
    month rollup and the lag window."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    monthly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_format("l_shipdate", "yyyy-MM").alias("m"),
    ).agg(
        F.expr(
            "sum(cast(round(l_extendedprice * 100, 0) as bigint))"
            " div sum(cast(l_quantity as bigint))"
        ).alias("unit_cents")
    )
    w = Window.partitionBy("pk").orderBy("m")
    changes = monthly.withColumn("prev_cents", F.lag("unit_cents").over(w))
    flagged = changes.select(
        "pk",
        F.when(
            F.col("prev_cents").isNotNull()
            & (F.col("unit_cents") != F.col("prev_cents")),
            1,
        )
        .otherwise(0)
        .alias("changed"),
        F.when(
            F.col("prev_cents").isNotNull() & (F.col("prev_cents") > 0),
            F.expr("abs(unit_cents - prev_cents) * 1000000 div prev_cents"),
        )
        .otherwise(0)
        .alias("jump_ppm"),
    )
    return flagged.agg(
        F.countDistinct("pk").alias("n_parts"),
        F.sum("changed").alias("n_repricings"),
        F.max("jump_ppm").alias("max_jump_ppm"),
        F.countDistinct(F.when(F.col("changed") == 1, F.col("pk"))).alias(
            "n_parts_repriced"
        ),
    )
