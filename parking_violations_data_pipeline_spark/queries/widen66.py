"""Round-3 widening batch 67: Wald-Wolfowitz runs test for
randomness of the hourly revenue sign sequence — the ±3σ band
cross-multiplied into pure integers (no sqrt, no doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_runs_test",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, h
),
med AS (
  SELECT event_type, y, h,
    row_number() OVER (PARTITION BY event_type ORDER BY y, h) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
median_val AS (
  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN y END) AS m
  FROM med GROUP BY event_type
),
signs AS (
  SELECT h.event_type, h.h,
    CASE WHEN h.y > mv.m THEN 1 ELSE 0 END AS s
  FROM hourly h JOIN median_val mv ON h.event_type = mv.event_type
  WHERE h.y <> mv.m
),
flips AS (
  SELECT event_type, s,
    lag(s) OVER (PARTITION BY event_type ORDER BY h) AS prev
  FROM signs
),
stats AS (
  SELECT event_type,
    CAST(1 + sum(CASE WHEN prev IS NOT NULL AND s <> prev THEN 1 ELSE 0 END)
         AS BIGINT) AS r,
    CAST(sum(s) AS BIGINT) AS a,
    CAST(count(*) - sum(s) AS BIGINT) AS b,
    CAST(count(*) AS BIGINT) AS n
  FROM flips GROUP BY event_type
)
SELECT event_type, r AS n_runs, a AS n_above, b AS n_below,
  -- |R·n − (2ab + n)|²·(n−1) ≤ 9·2ab·(2ab − n) ⟺ |z| ≤ 3, integers only
  CASE WHEN (r * n - (2 * a * b + n)) * (r * n - (2 * a * b + n)) * (n - 1)
            <= 9 * 2 * a * b * (2 * a * b - n)
       THEN 'random' ELSE 'patterned' END AS verdict
FROM stats ORDER BY event_type
""",
    tags=("D8", "E2"),
)
def d_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the hourly revenue sign sequence
    (above/below the rank-exact median; ties dropped): too FEW runs
    means trending/clustered data, too many means oscillation —
    the nonparametric randomness check behind residual diagnostics.
    The ±3σ acceptance band cross-multiplies into the pure-integer
    inequality (R·n − (2ab+n))²·(n−1) ≤ 18ab(2ab−n) — the σ's sqrt
    never materializes, so the verdict is bit-exact. All windows run
    at hourly grain.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            epoch_us("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select("event_type", F.expr("us div 3600000000").alias("h"), "cents")
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("y"))
    )
    w_rank = Window.partitionBy("event_type").orderBy("y", "h")
    w_n = Window.partitionBy("event_type")
    med = hourly.select(
        "event_type",
        "y",
        "h",
        F.row_number().over(w_rank).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    median_val = med.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("y"))).alias("m")
    )
    signs = (
        hourly.join(F.broadcast(median_val), "event_type")
        .filter(F.col("y") != F.col("m"))
        .select("event_type", "h", F.when(F.col("y") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    w_ord = Window.partitionBy("event_type").orderBy("h")
    flips = signs.select(
        "event_type", "s", F.lag("s").over(w_ord).alias("prev")
    )
    stats = flips.groupBy("event_type").agg(
        (
            F.lit(1)
            + F.sum(
                F.when(F.col("prev").isNotNull() & (F.col("s") != F.col("prev")), 1)
                .otherwise(0)
            )
        ).cast("long").alias("r"),
        F.sum("s").alias("a"),
        (F.count("*") - F.sum("s")).alias("b"),
        F.count("*").alias("n"),
    )
    lhs = F.expr("(r * n - (2 * a * b + n)) * (r * n - (2 * a * b + n)) * (n - 1)")
    rhs = F.expr("9 * 2 * a * b * (2 * a * b - n)")
    return stats.select(
        "event_type",
        F.col("r").alias("n_runs"),
        F.col("a").alias("n_above"),
        F.col("b").alias("n_below"),
        F.when(lhs <= rhs, "random").otherwise("patterned").alias("verdict"),
    ).orderBy("event_type")
