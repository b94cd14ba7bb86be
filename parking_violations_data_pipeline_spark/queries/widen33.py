"""Round-3 widening batch 34: volatility-band breach counting with a
fully integer variance test (no floating-point σ), segment×brand
cross-sell penetration, and exact Kendall rank correlation over a
bounded entity set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "e_bollinger_breaches",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, h
),
rolled AS (
  SELECT event_type, h, x,
    CAST(count(*) OVER w AS BIGINT) AS n,
    CAST(sum(x) OVER w AS BIGINT) AS s1,
    CAST(sum(x * x) OVER w AS BIGINT) AS s2
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 23 PRECEDING AND 1 PRECEDING)
),
tested AS (
  SELECT event_type,
    CASE WHEN n >= 12 AND (n * x - s1) * (n * x - s1) > 4 * (n * s2 - s1 * s1)
         THEN 1 ELSE 0 END AS breach,
    CASE WHEN n >= 12 THEN 1 ELSE 0 END AS tested
  FROM rolled
)
SELECT event_type,
  CAST(sum(tested) AS BIGINT) AS n_tested,
  CAST(sum(breach) AS BIGINT) AS n_breaches,
  CAST(sum(breach) * 1000000 // sum(tested) AS BIGINT) AS breach_ppm
FROM tested GROUP BY event_type ORDER BY event_type
""",
    tags=("E3", "D8"),
)
def e_bollinger_breaches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach counting over the trailing 24-hour
    window WITHOUT floating-point σ: x breaches the 2σ band iff
    (x − mean)² > 4·var, which cross-multiplies to the pure-integer
    test (n·x − S1)² > 4·(n·S2 − S1²) on the rolling sufficient
    sums — a double-σ comparison could flip at the band edge on
    ulps; the integer form cannot. The frame EXCLUDES the current
    row (bands from history only, the look-ahead-free formulation);
    rows with under 12 hours of history aren't tested. Windows run
    at hourly grain on one event_type shuffle.
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
        .agg(F.sum("cents").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-23, -1)
    rolled = hourly.select(
        "event_type",
        "x",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("s1"),
        F.sum(F.expr("x * x")).over(w).alias("s2"),
    )
    tested = rolled.select(
        "event_type",
        F.when(
            (F.col("n") >= 12)
            & (
                (F.col("n") * F.col("x") - F.col("s1"))
                * (F.col("n") * F.col("x") - F.col("s1"))
                > 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            ),
            1,
        )
        .otherwise(0)
        .alias("breach"),
        F.when(F.col("n") >= 12, 1).otherwise(0).alias("tested"),
    )
    return (
        tested.groupBy("event_type")
        .agg(
            F.sum("tested").alias("n_tested"),
            F.sum("breach").alias("n_breaches"),
            # NULL ppm when no hour had enough history to test
            # (DuckDB // 0 is NULL, not an ANSI abort)
            F.when(
                F.sum("tested") > 0,
                F.expr("sum(breach) * 1000000 div sum(tested)"),
            ).alias("breach_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "q_cross_sell_matrix",
    oracle="""
WITH seg_size AS (
  SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_seg
  FROM customer GROUP BY c_mktsegment
),
pen AS (
  SELECT c.c_mktsegment AS seg, p.p_brand AS brand,
    CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_buyers
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY c.c_mktsegment, p.p_brand
)
SELECT pen.seg, pen.brand, pen.n_buyers,
  CAST(pen.n_buyers * 1000000 // s.n_seg AS BIGINT) AS penetration_ppm
FROM pen JOIN seg_size s ON pen.seg = s.seg
ORDER BY pen.seg, pen.brand
""",
    tags=("C1", "D2", "D1"),
)
def q_cross_sell_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sell penetration matrix: for every (market segment,
    brand) cell, how many distinct customers bought the brand and
    what share of the segment that is — the assortment/whitespace
    view category managers run. The distinct-buyer count shuffles
    (seg, brand, custkey) once; segment sizes broadcast back; ppm by
    floor division.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    seg_size = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").alias("n_seg")
    )
    pen = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c.select("c_custkey", "c_mktsegment"), sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("p_brand").alias("brand"))
        .agg(F.countDistinct("c_custkey").alias("n_buyers"))
    )
    return (
        pen.join(F.broadcast(seg_size), "seg")
        .select(
            "seg",
            "brand",
            "n_buyers",
            F.expr("n_buyers * 1000000 div n_seg").alias("penetration_ppm"),
        )
        .orderBy("seg", "brand")
    )


@register(
    "d_kendall_tau",
    oracle="""
WITH m AS (
  SELECT n.n_name AS nation,
    CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_cents,
    CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_cust
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
pairs AS (
  SELECT
    CASE WHEN (a.rev_cents - b.rev_cents) * (a.n_cust - b.n_cust) > 0 THEN 1 ELSE 0 END AS conc,
    CASE WHEN (a.rev_cents - b.rev_cents) * (a.n_cust - b.n_cust) < 0 THEN 1 ELSE 0 END AS disc
  FROM m a JOIN m b ON a.nation < b.nation
)
SELECT
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(conc) AS BIGINT) AS concordant,
  CAST(sum(disc) AS BIGINT) AS discordant,
  CAST((sum(conc) - sum(disc)) * 1000000 // count(*) AS BIGINT) AS tau_a_ppm
FROM pairs
""",
    tags=("D8", "C7"),
)
def d_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall τ-a between two nation-level metrics (total
    revenue vs distinct customers): the non-parametric rank
    agreement that, unlike Pearson, needs no distributional
    assumption and no floating point — concordance is the SIGN of a
    cross-product of integer differences. The all-pairs comparison
    is explicitly bounded by the entity set (25 nations → 300
    pairs), the general pattern for rank-correlating any rolled-up
    leaderboard; the data-sized stage is the nation rollup.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    m = (
        o.join(maybe_broadcast(c.select("c_custkey", "c_nationkey"), sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("rev_cents"),
            F.countDistinct("o_custkey").alias("n_cust"),
        )
    )
    a = m.alias("a")
    b = m.alias("b")
    sign = (F.col("a.rev_cents") - F.col("b.rev_cents")) * (
        F.col("a.n_cust") - F.col("b.n_cust")
    )
    pairs = a.join(b, F.col("a.nation") < F.col("b.nation")).select(
        F.when(sign > 0, 1).otherwise(0).alias("conc"),
        F.when(sign < 0, 1).otherwise(0).alias("disc"),
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum("conc").alias("concordant"),
        F.sum("disc").alias("discordant"),
        F.expr("(sum(conc) - sum(disc)) * 1000000 div count(*)").alias("tau_a_ppm"),
    )
