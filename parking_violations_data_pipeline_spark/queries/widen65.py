"""Round-3 widening batch 66: the data-completeness watermark — the
highest day through which every prior day meets its volume threshold,
per source partition (the freshness/completeness contract downstream
consumers key off before trusting a partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "etl_completeness_watermark",
    oracle="""
WITH daily AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS d,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, d
),
bounds AS (
  SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY event_type
),
spine AS (
  SELECT b.event_type, b.d0, t.day_id
  FROM bounds b, unnest(generate_series(b.d0, b.d1)) AS t(day_id)
),
graded AS (
  SELECT s.event_type, s.day_id,
    CASE WHEN coalesce(dy.n, 0) >= 10 THEN 1 ELSE 0 END AS complete
  FROM spine s LEFT JOIN daily dy
    ON s.event_type = dy.event_type AND s.day_id = dy.d
),
runs AS (
  SELECT event_type, day_id, complete,
    min(CASE WHEN complete = 0 THEN day_id END)
      OVER (PARTITION BY event_type) AS first_gap
  FROM graded
)
SELECT event_type,
  CAST(max(CASE WHEN first_gap IS NULL THEN day_id
                WHEN day_id < first_gap THEN day_id END) AS BIGINT) AS watermark_day,
  CAST(count(*) AS BIGINT) AS n_days_spanned,
  CAST(sum(1 - complete) AS BIGINT) AS n_incomplete_days
FROM runs GROUP BY event_type ORDER BY event_type
""",
    tags=("L", "B5", "H2"),
)
def etl_completeness_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-completeness watermark per source stream: the LAST day
    through which every day from the stream's start meets the
    volume threshold (≥10 rows here) — the contract a downstream
    consumer reads before trusting partitions ('data is complete
    through day W; anything after may still be loading'). A single
    thin day FREEZES the watermark even if later days are full —
    exactly the semantics, computed as days strictly before the
    first incomplete day on a densified spine (gap days count as
    incomplete). One day-grain rollup + spine + one window.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select("event_type", epoch_us("ts").alias("us"))
        .select("event_type", F.expr("us div 86400000000").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count("*").alias("n"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("day_id")
    )
    graded = spine.join(
        daily.select(F.col("event_type").alias("et"), F.col("d"), "n"),
        (spine.event_type == F.col("et")) & (spine.day_id == F.col("d")),
        "left",
    ).select(
        "event_type",
        "day_id",
        F.when(F.coalesce("n", F.lit(0)) >= 10, 1).otherwise(0).alias("complete"),
    )
    w = Window.partitionBy("event_type")
    runs = graded.select(
        "event_type",
        "day_id",
        "complete",
        F.min(F.when(F.col("complete") == 0, F.col("day_id"))).over(w).alias("first_gap"),
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("first_gap").isNull(), F.col("day_id")).when(
                    F.col("day_id") < F.col("first_gap"), F.col("day_id")
                )
            ).alias("watermark_day"),
            F.count("*").alias("n_days_spanned"),
            F.sum(1 - F.col("complete")).alias("n_incomplete_days"),
        )
        .orderBy("event_type")
    )
