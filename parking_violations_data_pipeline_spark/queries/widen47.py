"""Round-3 widening batch 48: FORWARD as-of join (next scheduled
version at-or-after each probe — the mirror of C8's backward
semantics, new `direction` mode on operators/asof.asof_join) and
service-level stock targets from rank-exact demand quantiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.operators.asof import asof_join
from parking_violations_data_pipeline_spark.registry import register


@register(
    "c_asof_forward",
    oracle="""
WITH rates AS (
  SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS rts,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events WHERE day(CAST(ts AS TIMESTAMP)) % 3 = 0
  GROUP BY event_type, rts
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(r.day_cents) AS BIGINT) AS sum_next_cents
FROM (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events) e
ASOF JOIN rates r ON e.event_type = r.event_type AND e.ts <= r.rts
GROUP BY e.event_type ORDER BY e.event_type
""",
    tags=("C8", "E2"),
)
def c_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each event attaches the NEXT daily summary row
    at-or-after its timestamp (every-3rd-day summaries, same series
    as c_asof_join but mirrored) — the "next scheduled revision /
    next maintenance window" lookup that backward as-of cannot
    express. Runs through the same single-shuffle union+window
    operator with `direction='forward'` (time walked in reverse so
    running-last becomes earliest-at-or-after); DuckDB's native ASOF
    with the inequality flipped (e.ts <= r.rts) is the oracle.
    Events after the final summary drop under how='inner' on both
    engines; the payload is integer day-cents so sums are exact.
    """
    e = load_table(spark, sf_dir, "events")
    rates = (
        e.filter(F.dayofmonth("ts") % 3 == 0)
        .groupBy(
            "event_type", F.date_trunc("day", "ts").alias("rts")
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("day_cents"))
    )
    probes = e.select("event_type", "ts")
    joined = asof_join(
        probes,
        rates,
        on=["event_type"],
        left_time="ts",
        right_time="rts",
        payload=["day_cents"],
        how="inner",
        direction="forward",
    )
    return (
        joined.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.sum("day_cents").alias("sum_next_cents"))
        .orderBy("event_type")
    )


@register(
    "q_service_level_stock",
    oracle="""
WITH monthly AS (
  SELECT p.p_brand AS brand, year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS m,
    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS demand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY brand, m
),
ranked AS (
  SELECT brand, demand,
    row_number() OVER (PARTITION BY brand ORDER BY demand, m) AS rn,
    count(*) OVER (PARTITION BY brand) AS n,
    CAST(sum(demand) OVER (PARTITION BY brand) AS BIGINT) AS tot
  FROM monthly
)
SELECT brand,
  CAST(max(n) AS BIGINT) AS n_months,
  CAST(max(tot) * 1000 // (max(n) * 1000) AS BIGINT) AS mean_demand,
  CAST(max(CASE WHEN rn = (95 * n + 99) // 100 THEN demand END) AS BIGINT) AS p95_demand,
  CAST(max(CASE WHEN rn = (95 * n + 99) // 100 THEN demand END)
     - max(tot) // max(n) AS BIGINT) AS safety_stock
FROM ranked GROUP BY brand ORDER BY brand
""",
    tags=("D5", "E1", "D1"),
)
def q_service_level_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-level stock targets (newsvendor-style): per brand the
    95th-percentile monthly demand — the order-up-to level that
    covers 95% of months — and the implied safety stock above mean
    demand. The quantile is rank-exact at ⌈0.95·n⌉ of a (demand,
    month) total order (the discrete-quantile house rule); mean via
    floor division. Windows run over the brand×month rollup, never
    at line grain.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    m = (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("m")
    monthly = (
        l.join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), m)
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("demand"))
    )
    w = Window.partitionBy("brand").orderBy("demand", "m")
    w_n = Window.partitionBy("brand")
    ranked = monthly.select(
        "brand",
        "demand",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_n).alias("n"),
        F.sum("demand").over(w_n).alias("tot"),
    )
    return (
        ranked.groupBy("brand")
        .agg(
            F.max("n").alias("n_months"),
            F.expr("max(tot) * 1000 div (max(n) * 1000)").alias("mean_demand"),
            F.max(
                F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("demand"))
            ).alias("p95_demand"),
            (
                F.max(
                    F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("demand"))
                )
                - F.expr("max(tot) div max(n)")
            ).alias("safety_stock"),
        )
        .orderBy("brand")
    )
