"""Round-3 widening batch 62: FIFO cost-of-goods-sold — the
oldest-units-first matching every inventory ledger runs, expressed as
prefix-sum interval overlap instead of a procedural loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_fifo_cogs",
    oracle="""
WITH buys AS (
  SELECT l_partkey, epoch_us(l_shipdate) AS us, l_orderkey, l_linenumber,
    CAST(l_quantity AS BIGINT) AS qty,
    CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 1000
      // CAST(l_quantity AS BIGINT) AS unit_milli
  FROM lineitem WHERE year(l_shipdate) = 1997 AND l_quantity > 0
),
sells AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold
  FROM lineitem WHERE year(l_shipdate) = 1998 GROUP BY l_partkey
),
layered AS (
  SELECT b.l_partkey, b.qty, b.unit_milli, s.sold,
    CAST(coalesce(sum(b.qty) OVER (PARTITION BY b.l_partkey
      ORDER BY b.us, b.l_orderkey, b.l_linenumber, b.unit_milli, b.qty
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM buys b JOIN sells s ON b.l_partkey = s.l_partkey
),
matched AS (
  SELECT l_partkey, unit_milli,
    greatest(least(sold - cum_before, qty), 0) AS units_used,
    qty
  FROM layered
),
per_part AS (
  SELECT m.l_partkey,
    CAST(sum(m.units_used) AS BIGINT) AS units_matched,
    CAST(sum(m.units_used * m.unit_milli) // 1000 AS BIGINT) AS cogs_cents,
    CAST(sum(m.qty) AS BIGINT) AS bought
  FROM matched m GROUP BY m.l_partkey
)
SELECT p.p_brand,
  CAST(count(*) AS BIGINT) AS n_parts,
  CAST(sum(pp.units_matched) AS BIGINT) AS units_matched,
  CAST(sum(pp.cogs_cents) AS BIGINT) AS fifo_cogs_cents,
  CAST(sum(pp.bought - pp.units_matched) AS BIGINT) AS units_left
FROM per_part pp JOIN part p ON pp.l_partkey = p.p_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
""",
    tags=("E3", "C1", "D1"),
)
def q_fifo_cogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO cost of goods sold, relationally: 1997 receipts form cost
    layers per part (ordered by ship date), 1998 demand consumes them
    oldest-first — each layer contributes
    clamp(sold − cum_before, 0, qty) units at its own unit cost, the
    prefix-sum interval-overlap identity that replaces the
    procedural match-loop every ledger system hides inside. One
    ordered window per part for the cumulative layers, pure integer
    milli-cost arithmetic (truncating unit division — the same cents
    grid both engines share), then a brand rollup. Unsold layer
    remainder reports as ending inventory units.
    """
    l = load_table(spark, sf_dir, "lineitem")
    from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us

    y = F.year("l_shipdate")
    buys = l.filter((y == 1997) & (F.col("l_quantity") > 0)).select(
        "l_partkey",
        epoch_us("l_shipdate").alias("us"),
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("long").alias("qty"),
        F.expr(
            "cast(round(l_extendedprice * 100, 0) as bigint) * 1000"
            " div cast(l_quantity as bigint)"
        ).alias("unit_milli"),
    )
    sells = (
        l.filter(y == 1998)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sold"))
        .withColumnRenamed("l_partkey", "sk")
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("us", "l_orderkey", "l_linenumber", "unit_milli", "qty")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    layered = buys.join(sells, buys.l_partkey == sells.sk).select(
        "l_partkey",
        "qty",
        "unit_milli",
        "sold",
        F.coalesce(F.sum("qty").over(w), F.lit(0)).alias("cum_before"),
    )
    matched = layered.select(
        "l_partkey",
        "unit_milli",
        "qty",
        F.greatest(
            F.least(F.col("sold") - F.col("cum_before"), F.col("qty")), F.lit(0)
        ).alias("units_used"),
    )
    per_part = matched.groupBy("l_partkey").agg(
        F.sum("units_used").alias("units_matched"),
        F.expr("sum(units_used * unit_milli) div 1000").alias("cogs_cents"),
        F.sum("qty").alias("bought"),
    )
    p = load_table(spark, sf_dir, "part")
    return (
        per_part.join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"),
                      per_part.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("units_matched").alias("units_matched"),
            F.sum("cogs_cents").alias("fifo_cogs_cents"),
            F.sum(F.col("bought") - F.col("units_matched")).alias("units_left"),
        )
        .orderBy("p_brand")
    )
