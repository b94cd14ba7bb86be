"""Round-4 widening batch 107: cross-price elasticity signs (the
substitution/complement matrix), inter-event-time burstiness (the
σ-vs-μ test with no square roots), and the top-N + OTHER rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_cross_elasticity_sign",
    oracle="""
WITH monthly AS (
  SELECT p.p_brand AS brand, strftime(l.l_shipdate, '%Y-%m') AS m,
    sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents,
    sum(CAST(l.l_quantity AS BIGINT)) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand IN ('Brand#11', 'Brand#22')
  GROUP BY brand, m
),
px AS (
  SELECT a.m,
    a.cents * 1000 // a.qty AS price_a_milli,
    b.qty AS qty_b
  FROM monthly a JOIN monthly b ON a.m = b.m
  WHERE a.brand = 'Brand#11' AND b.brand = 'Brand#22'
    AND a.qty > 0 AND b.qty > 0
),
s AS (
  SELECT count(*) AS n,
    sum(CAST(price_a_milli AS BIGINT)) AS sx, sum(qty_b) AS sy,
    sum(CAST(price_a_milli AS BIGINT) * qty_b) AS sxy
  FROM (SELECT CAST(price_a_milli AS BIGINT) AS price_a_milli, qty_b FROM px)
)
SELECT
  CAST(n AS BIGINT) AS n_months,
  CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
  CAST(sign(n * sxy - sx * sy) AS BIGINT) AS relation_sign
FROM s
""",
    tags=("D8", "C1"),
)
def q_cross_elasticity_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-price relationship between two brands: does Brand#22's
    monthly volume move WITH Brand#11's unit price (substitutes,
    positive sign) or AGAINST it (complements, negative)? The
    covariance sign comes from the integer cross-product
    n·Σxy − Σx·Σy over (unit-price-milli, qty) month pairs — no
    division, no doubles, bit-exact verdict. Unit price is the
    integer milli-cents ratio per month (quantity-weighted). One
    broadcast-dim join + month rollup; the covariance runs on
    |months| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    monthly = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li["l_partkey"] == p["p_partkey"])
        .filter(F.col("p_brand").isin("Brand#11", "Brand#22"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("l_shipdate", "yyyy-MM").alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    a = monthly.filter(F.col("brand") == "Brand#11").select(
        "m", F.expr("cents * 1000 div qty").alias("price_a_milli"), F.col("qty")
    ).filter(F.col("qty") > 0)
    b = monthly.filter(F.col("brand") == "Brand#22").select(
        "m", F.col("qty").alias("qty_b")
    ).filter(F.col("qty_b") > 0)
    px = a.join(b, "m").select("price_a_milli", "qty_b")
    s = px.agg(
        F.count("*").alias("n"),
        F.sum("price_a_milli").alias("sx"),
        F.sum("qty_b").alias("sy"),
        F.sum(F.col("price_a_milli") * F.col("qty_b")).alias("sxy"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_months"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("cov_num"),
        F.signum(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        )
        .cast("long")
        .alias("relation_sign"),
    )


@register(
    "e_interevent_burstiness",
    oracle="""
WITH gaps AS (
  SELECT event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
                                           ORDER BY epoch_us(ts), event_id)
      AS g
  FROM events
),
s AS (
  SELECT event_type, count(*) AS n, sum(g::HUGEINT) AS sx,
    sum(g::HUGEINT * g) AS sxx
  FROM gaps WHERE g IS NOT NULL GROUP BY event_type
)
SELECT event_type,
  CAST(n AS BIGINT) AS n_gaps,
  CAST(sign(n * sxx - 2 * sx * sx) AS BIGINT) AS bursty_sign
FROM s ORDER BY event_type
""",
    tags=("E2", "D8"),
)
def e_interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-time burstiness: a process is bursty when the gap
    distribution's σ exceeds its μ (a Poisson process has σ = μ; the
    companion to e_fano_burstiness which tests COUNTS). The test
    σ² > μ² cross-multiplies to the integer sign of n·Σg² − 2·(Σg)²
    — no mean, no variance, no sqrt ever materializes. One lag window
    per event_type. The g² products exceed int64 (g ~ 2e10 µs gaps at
    sf0.001), so the Spark sums run in explicit DECIMAL(38,0) and the
    oracle's in HUGEINT — the overflow class the d_sigma_bands lesson
    catalogued."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(epoch_us("ts"), F.col("event_id"))
    gaps = e.select(
        "event_type",
        (epoch_us("ts") - F.lag(epoch_us("ts")).over(w)).alias("g"),
    ).filter(F.col("g").isNotNull())
    s = gaps.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("g").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.col("g").cast("decimal(38,0)") * F.col("g").cast("decimal(38,0)")
        ).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.signum(
            (F.col("n") * F.col("sxx") - 2 * F.col("sx") * F.col("sx")).cast(
                "double"
            )
        )
        .cast("long")
        .alias("bursty_sign"),
    ).orderBy("event_type")
