"""Round-4 widening batch 108: the top-N + OTHER presentation rollup
(every BI report's long-tail fold) and the quantized harmonic mean
(the rate-averaging aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_topn_other_rollup",
    oracle="""
WITH b AS (
  SELECT p.p_brand AS brand,
    sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY brand
),
ranked AS (
  SELECT brand, cents,
    row_number() OVER (ORDER BY cents DESC, brand) AS rn
  FROM b
),
folded AS (
  SELECT CASE WHEN rn <= 3 THEN brand ELSE 'OTHER' END AS label,
    cents
  FROM ranked
)
SELECT label,
  CAST(sum(cents) AS BIGINT) AS cents,
  CAST(sum(cents) * 1000000 // (SELECT sum(cents) FROM b) AS BIGINT)
    AS share_ppm
FROM folded GROUP BY label ORDER BY cents DESC, label
""",
    tags=("F3", "D1", "B6"),
)
def q_topn_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N + OTHER: the presentation fold every BI report applies to
    a long-tailed dimension — the top 3 brands by revenue keep their
    names, everything else collapses into one OTHER bucket, shares in
    integer ppm of the grand total. Deterministic membership via the
    full-key (cents, brand) rank. The fold happens at the ROLLUP
    grain (|brands| rows), never on the fact table — the tail
    collapse costs nothing at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
    )
    ranked = b.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("cents"), "brand"))
    )
    folded = ranked.select(
        F.when(F.col("rn") <= 3, F.col("brand")).otherwise("OTHER").alias("label"),
        "cents",
    )
    total = b.agg(F.sum("cents").alias("t"))
    return (
        folded.groupBy("label")
        .agg(F.sum("cents").alias("cents"))
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            "cents",
            F.expr("cents * 1000000 div t").alias("share_ppm"),
        )
        .orderBy(F.desc("cents"), "label")
    )


@register(
    "d_harmonic_mean_quantized",
    oracle="""
WITH unit AS (
  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT)
           // CAST(l_quantity AS BIGINT) AS unit_cents
  FROM lineitem WHERE l_quantity > 0
),
recip AS (
  SELECT unit_cents, 1000000000000 // unit_cents AS r_pico
  FROM unit WHERE unit_cents > 0
)
SELECT
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(r_pico) AS BIGINT) AS sum_recip_pico,
  CAST(count(*) * 1000000000000 // sum(r_pico) AS BIGINT)
    AS harmonic_mean_cents,
  CAST(sum(unit_cents) // count(*) AS BIGINT) AS arith_mean_cents,
  (count(*) * 1000000000000 // sum(r_pico) <= sum(unit_cents) // count(*))
    AS am_hm_inequality_ok
FROM recip
""",
    tags=("D1", "H3"),
)
def d_harmonic_mean_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic mean of unit prices — the correct average for rates
    (average price per unit when each line contributes equal quantity
    weight). Reciprocals are quantized to pico-units (1e12 // x) so
    the sum is order-free integer math and both engines produce the
    identical quantized HM — the same one-log/one-division quantize
    discipline as d_mutual_information. The AM ≥ HM inequality is
    emitted as an in-plan boolean — a mathematical identity the
    quantization must not break (truncation only ever LOWERS the
    reported HM, preserving the bound)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    unit = li.select(
        F.expr(
            "cast(round(l_extendedprice * 100, 0) as bigint)"
            " div cast(l_quantity as bigint)"
        ).alias("unit_cents")
    ).filter(F.col("unit_cents") > 0)
    recip = unit.select(
        "unit_cents", F.expr("1000000000000 div unit_cents").alias("r_pico")
    )
    return recip.agg(
        F.count("*").alias("n"),
        F.sum("r_pico").alias("sum_recip_pico"),
        F.expr("count(*) * 1000000000000 div sum(r_pico)").alias(
            "harmonic_mean_cents"
        ),
        F.expr("sum(unit_cents) div count(*)").alias("arith_mean_cents"),
        F.expr(
            "count(*) * 1000000000000 div sum(r_pico)"
            " <= sum(unit_cents) div count(*)"
        ).alias("am_hm_inequality_ok"),
    )
