"""Round-4 widening batch 104: time-weighted average price (TWAP —
the step-function integral VWAP ignores) and stratified systematic
sampling (every k-th element per stratum, the census-style design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "e_twap",
    oracle="""
WITH p AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE value > 0
),
seg AS (
  SELECT event_type, cents,
    lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id) - us
      AS hold_us
  FROM p
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_segments,
  CAST(sum(hold_us) AS BIGINT) AS total_us,
  CAST(trunc(sum(cents::DECIMAL(38,0) * hold_us) / sum(hold_us)) AS BIGINT)
    AS twap_cents
FROM seg WHERE hold_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    tags=("E2", "D1"),
)
def e_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price (TWAP): each observed value HOLDS
    until the next observation, so the average weights every value by
    its holding duration — ∫v(t)dt / T as a step-function integral,
    the fair 'average level' metric where VWAP (volume-weighted,
    q_vwap_monthly) answers a different question. One lead window per
    event_type gives the hold intervals; cents×µs products run in
    DECIMAL(38) (the bigint form overflows at sf0.1) and the final
    division truncates identically cross-engine. The last observation
    of each series has no successor and is excluded — the windowed
    [first, last) convention."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    p = e.select(
        "event_type",
        epoch_us("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    seg = p.select(
        "event_type",
        "cents",
        (F.lead("us").over(w) - F.col("us")).alias("hold_us"),
    ).filter(F.col("hold_us").isNotNull())
    return (
        seg.groupBy("event_type")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("hold_us").alias("total_us"),
            # all-zero holding times (identical timestamps) → TWAP
            # undefined → NULL (DuckDB // 0), not an ANSI abort
            F.when(
                F.sum("hold_us") > 0,
                F.expr(
                    "cast(sum(cast(cents as decimal(38,0)) * hold_us)"
                    " div sum(hold_us) as bigint)"
                ),
            ).alias("twap_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "f_systematic_sample",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority AS pri,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
    row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
SELECT pri,
  CAST(count(*) AS BIGINT) AS n_sampled,
  CAST(sum(cents) AS BIGINT) AS sampled_cents,
  CAST(min(rn) AS BIGINT) AS first_rank,
  CAST(max(rn) AS BIGINT) AS last_rank
FROM ranked WHERE rn % 10 = 3
GROUP BY pri ORDER BY pri
""",
    tags=("F4", "E1"),
)
def f_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified SYSTEMATIC sampling: within each priority stratum,
    rank by (date, key) and keep every 10th row at a fixed offset —
    the census/audit design that guarantees even coverage across the
    ordering dimension (a seeded random sample can cluster; the
    systematic grid cannot), and it's exactly reproducible with no
    seed infrastructure at all. Distinct from f_sample's Bernoulli
    draw. One rank window per stratum, then a modulus filter."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        ranked.filter(F.col("rn") % 10 == 3)
        .groupBy("pri")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("cents").alias("sampled_cents"),
            F.min("rn").alias("first_rank"),
            F.max("rn").alias("last_rank"),
        )
        .orderBy("pri")
    )
