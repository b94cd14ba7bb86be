"""Round-3 widening batch 46: OTIF (on-time-in-full) service-level
measurement via order-grain boolean aggregation, and the join-fanout
audit (cardinality diagnostics around a fact-fact join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_otif_rate",
    oracle="""
WITH line_flags AS (
  SELECT l.l_orderkey,
    epoch_us(l.l_shipdate) <= epoch_us(o.o_orderdate) + 30 * 86400000000 AS on_time
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_order AS (
  SELECT lf.l_orderkey, bool_and(lf.on_time) AS otif
  FROM line_flags lf GROUP BY lf.l_orderkey
),
labeled AS (
  SELECT o.o_orderpriority, p.otif
  FROM per_order p JOIN orders o ON p.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN otif THEN 1 ELSE 0 END) AS BIGINT) AS n_otif,
  CAST(sum(CASE WHEN otif THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS otif_ppm
FROM labeled GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("D1", "C1", "H2"),
)
def q_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTIF (on-time-in-full): an order scores only if EVERY line
    shipped within 30 days of order date — the all-or-nothing
    service KPI (one late line fails the whole order), which is
    precisely a bool_and at order grain, not a line-level average
    (line-level on-time% systematically overstates service). Two
    passes on the same orderkey partitioning; day arithmetic in µs
    integers.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    line_flags = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        (
            epoch_us("l_shipdate")
            <= epoch_us("o_orderdate") + F.lit(30 * 86400000000)
        ).alias("on_time"),
    )
    per_order = line_flags.groupBy("l_orderkey").agg(
        F.bool_and("on_time").alias("otif")
    )
    labeled = per_order.join(
        o.select("o_orderkey", "o_orderpriority"),
        per_order.l_orderkey == F.col("o_orderkey"),
    )
    return (
        labeled.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("otif"), 1).otherwise(0)).alias("n_otif"),
            F.expr(
                "sum(CASE WHEN otif THEN 1 ELSE 0 END) * 1000000 div count(*)"
            ).alias("otif_ppm"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "c_join_fanout_audit",
    oracle="""
WITH pre AS (
  SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_left,
         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_right
),
fan AS (
  SELECT o.o_orderkey, CAST(count(l.l_orderkey) AS BIGINT) AS k
  FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY o.o_orderkey
)
SELECT
  pre.n_left, pre.n_right,
  CAST(sum(k) AS BIGINT) AS n_joined,
  CAST(max(k) AS BIGINT) AS max_fanout,
  CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched_left,
  CAST(sum(k) * 1000 // pre.n_left AS BIGINT) AS avg_fanout_milli
FROM fan CROSS JOIN pre
GROUP BY pre.n_left, pre.n_right
""",
    tags=("C1", "C2", "D1"),
)
def c_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-fanout audit: before trusting any fact-to-fact join, a
    pipeline measures what the join DOES to cardinality — output
    rows, max per-key multiplicity (the blow-up bound), unmatched
    keys (silent data loss under an inner join), and the average
    fanout. Computed from per-key counts on one shuffle rather than
    materializing the join twice; the three scalar inputs broadcast.
    This is the debugging query behind every 'why did my row count
    explode' incident.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pre = o.agg(F.count("*").alias("n_left")).crossJoin(
        F.broadcast(l.agg(F.count("*").alias("n_right")))
    )
    fan = (
        o.select("o_orderkey")
        .join(l.select(F.col("l_orderkey").alias("ok")), o.o_orderkey == F.col("ok"), "left")
        .groupBy("o_orderkey")
        .agg(F.count("ok").alias("k"))
    )
    return (
        fan.crossJoin(F.broadcast(pre))
        .groupBy("n_left", "n_right")
        .agg(
            F.sum("k").alias("n_joined"),
            F.max("k").alias("max_fanout"),
            F.sum(F.when(F.col("k") == 0, 1).otherwise(0)).alias("n_unmatched_left"),
            F.expr("sum(k) * 1000 div max(n_left)").alias("avg_fanout_milli"),
        )
        .select(
            "n_left", "n_right", "n_joined", "max_fanout",
            "n_unmatched_left", "avg_fanout_milli",
        )
    )
