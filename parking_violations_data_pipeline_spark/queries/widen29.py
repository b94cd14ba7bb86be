"""Round-3 widening batch 30: operations monitoring and preference
queries — backlog aging buckets, CUSUM drift alarms as a packed
integer fold, and the 2-D skyline (Pareto-frontier) operator via
running-min windows instead of the O(n²) dominance join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_backlog_aging",
    oracle="""
WITH o AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS od,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderstatus = 'O'
),
anchor AS (SELECT max(epoch_us(o_orderdate)) // 86400000000 AS today FROM orders),
aged AS (
  SELECT CASE WHEN today - od <= 30 THEN '0-030'
              WHEN today - od <= 60 THEN '031-060'
              WHEN today - od <= 90 THEN '061-090'
              ELSE '090+' END AS bucket,
         cents
  FROM o CROSS JOIN anchor
)
SELECT bucket,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(cents) AS BIGINT) AS cents
FROM aged GROUP BY bucket ORDER BY bucket
""",
    tags=("D1", "H2", "B6"),
)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging report: open orders bucketed by days outstanding
    (0-30 / 31-60 / 61-90 / 90+) against the corpus anchor date —
    the AR-aging / fulfillment-backlog query every operations
    dashboard carries. Integer epoch-day arithmetic (TZ-free), the
    anchor is a broadcast scalar, and bucket labels are zero-padded
    so lexical ORDER BY equals numeric order on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    od = o.select(
        epoch_us("o_orderdate").alias("ous"),
        F.col("o_orderstatus").alias("st"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    anchor = od.agg(F.expr("max(ous) div 86400000000").alias("today"))
    aged = (
        od.filter(F.col("st") == "O")
        .select(F.expr("ous div 86400000000").alias("oday"), "cents")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.when(F.col("today") - F.col("oday") <= 30, "0-030")
            .when(F.col("today") - F.col("oday") <= 60, "031-060")
            .when(F.col("today") - F.col("oday") <= 90, "061-090")
            .otherwise("090+")
            .alias("bucket"),
            "cents",
        )
    )
    return (
        aged.groupBy("bucket")
        .agg(F.count("*").alias("n_orders"), F.sum("cents").alias("cents"))
        .orderBy("bucket")
    )


@register(
    "e_cusum_alarms",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE ts IS NOT NULL GROUP BY event_type, h
),
keyed AS (
  SELECT event_type,
    CAST(sum(cents) // count(*) AS BIGINT) AS k,
    list(cents ORDER BY h) AS xs,
    CAST(count(*) AS BIGINT) AS n_hours
  FROM hourly GROUP BY event_type
),
folded AS (
  SELECT event_type, n_hours, k,
    list_reduce(
      list_prepend(CAST(0 AS BIGINT), xs),
      (acc, x) -> CASE
        WHEN greatest(CAST(0 AS BIGINT), acc // 65536 + x - k) > 2 * k
        THEN greatest(CAST(0 AS BIGINT), acc // 65536 + x - k) * 65536
             + acc % 65536 + 1
        ELSE greatest(CAST(0 AS BIGINT), acc // 65536 + x - k) * 65536
             + acc % 65536
      END
    ) AS packed
  FROM keyed
)
SELECT event_type, n_hours, k AS mean_hourly_cents,
  CAST(packed // 65536 AS BIGINT) AS final_s,
  CAST(packed % 65536 AS BIGINT) AS n_alarms
FROM folded ORDER BY event_type
""",
    tags=("E3", "H5", "D1"),
)
def e_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detector per event type: sᵢ = max(0, sᵢ₋₁ + xᵢ − k)
    over the hourly series (k = the series' own mean), alarm whenever
    s exceeds 2k — the classic sequential change detector that a
    window frame cannot express (the reset-at-zero recursion). The
    fold runs as a higher-order aggregate over each key's ordered
    hourly array (the e_ewma_fold shape: array bounded by hours, not
    events), with the two-field state (s, alarm count) PACKED into
    one bigint (s·2¹⁶ + alarms — alarms bounded by hours < 2¹⁶) so
    both engines fold the identical single-integer recurrence.
    """
    # hourly series is event-time-indexed: NULL ts dropped both sides
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = (
        e.select(
            "event_type",
            epoch_us("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select("event_type", F.expr("us div 3600000000").alias("h"), "cents")
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("cents"))
    )
    keyed = hourly.groupBy("event_type").agg(
        F.expr("sum(cents) div count(*)").alias("k"),
        F.expr(
            "transform(array_sort(collect_list(struct(h, cents))), s -> s.cents)"
        ).alias("xs"),
        F.count("*").alias("n_hours"),
    )
    folded = keyed.select(
        "event_type",
        "n_hours",
        F.col("k").alias("mean_hourly_cents"),
        F.expr(
            "aggregate(xs, cast(0 as bigint), (acc, x) -> CASE"
            " WHEN greatest(cast(0 as bigint), acc div 65536 + x - k) > 2 * k"
            " THEN greatest(cast(0 as bigint), acc div 65536 + x - k) * 65536"
            "      + acc % 65536 + 1"
            " ELSE greatest(cast(0 as bigint), acc div 65536 + x - k) * 65536"
            "      + acc % 65536 END)"
        ).alias("packed"),
    )
    return folded.select(
        "event_type",
        "n_hours",
        "mean_hourly_cents",
        F.expr("packed div 65536").alias("final_s"),
        F.expr("packed % 65536").alias("n_alarms"),
    ).orderBy("event_type")


@register(
    "q_skyline_parts",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_brand, p_size,
    CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_cents
  FROM part
),
ranked AS (
  SELECT p_partkey, p_brand, p_size, price_cents,
    min(p_size) OVER (ORDER BY price_cents
      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_cheaper,
    min(p_size) OVER (PARTITION BY price_cents) AS min_same
  FROM p
),
sky AS (
  SELECT p_brand, p_size, price_cents
  FROM ranked
  WHERE (min_cheaper IS NULL OR p_size < min_cheaper) AND p_size = min_same
)
SELECT p_brand,
  CAST(count(*) AS BIGINT) AS n_sky,
  CAST(min(price_cents) AS BIGINT) AS min_price_cents,
  CAST(min(p_size) AS BIGINT) AS min_size,
  CAST(sum(price_cents) AS BIGINT) AS sum_price_cents
FROM sky GROUP BY p_brand ORDER BY p_brand
""",
    tags=("E3", "F1", "C7"),
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts for which no other part
    is both cheaper-or-equal AND smaller-or-equal with one strict —
    the multi-criteria shortlist operator. The naive formulation is
    an O(n²) dominance anti-join; the 2-D rewrite is two windows:
    survive iff size < min(size) among STRICTLY cheaper parts (a
    value-RANGE frame ending 1 before the current price) AND size
    equals the minimum within the same price point (equal-price,
    smaller-size dominates; exact (price, size) duplicates all
    survive, since neither strictly dominates). Prices on the exact
    cent grid make the range frame integer-valued on both engines.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_size",
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("price_cents"),
    )
    w_cheaper = (
        Window.orderBy("price_cents").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("price_cents")
    ranked = p.select(
        "p_brand",
        "p_size",
        "price_cents",
        F.min("p_size").over(w_cheaper).alias("min_cheaper"),
        F.min("p_size").over(w_same).alias("min_same"),
    )
    sky = ranked.filter(
        (F.col("min_cheaper").isNull() | (F.col("p_size") < F.col("min_cheaper")))
        & (F.col("p_size") == F.col("min_same"))
    )
    return (
        sky.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_sky"),
            F.min("price_cents").alias("min_price_cents"),
            F.min("p_size").cast("long").alias("min_size"),
            F.sum("price_cents").alias("sum_price_cents"),
        )
        .orderBy("p_brand")
    )
