"""Round-3 widening batch 40: causal/dispersion analytics —
difference-in-differences promo uplift (exact cents), Fano-factor
burstiness classification, and per-group OLS trend fitting through
the applyInPandas surface with integer sufficient statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_diff_in_diff",
    oracle="""
WITH yr AS (
  SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 'promo' ELSE 'base' END AS grp,
    year(l.l_shipdate) AS y,
    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
    CAST(count(*) AS BIGINT) AS n
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN (1997, 1998)
  GROUP BY grp, y
),
wide AS (
  SELECT grp,
    max(CASE WHEN y = 1997 THEN cents END) AS c97,
    max(CASE WHEN y = 1998 THEN cents END) AS c98,
    max(CASE WHEN y = 1997 THEN n END) AS n97,
    max(CASE WHEN y = 1998 THEN n END) AS n98
  FROM yr GROUP BY grp
),
per AS (
  SELECT grp, c97, c98,
    c98 * 1000 // n98 - c97 * 1000 // n97 AS delta_per_line_milli
  FROM wide
)
SELECT
  CAST(max(CASE WHEN grp = 'promo' THEN c98 - c97 END) AS BIGINT) AS promo_delta_cents,
  CAST(max(CASE WHEN grp = 'base' THEN c98 - c97 END) AS BIGINT)  AS base_delta_cents,
  CAST(max(CASE WHEN grp = 'promo' THEN delta_per_line_milli END)
     - max(CASE WHEN grp = 'base' THEN delta_per_line_milli END) AS BIGINT)
    AS did_per_line_milli
FROM per
""",
    tags=("D1", "C1", "B6"),
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: promo-type parts (treatment) vs the
    rest (control), 1997→1998 — the causal-inference workhorse that
    nets out the market-wide trend from the treatment effect. The
    estimate is reported per line in milli-cents (Δtreat − Δcontrol
    of per-line averages via floor division), alongside the raw
    group deltas; all arithmetic on exact integer grids.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    y = F.year("l_shipdate")
    yr = (
        l.filter(y.isin(1997, 1998))
        .join(maybe_broadcast(p.select("p_partkey", "p_type"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(
            F.when(F.col("p_type").startswith("PROMO"), "promo").otherwise("base").alias("grp"),
            y.alias("y"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"),
            F.count("*").alias("n"),
        )
    )
    wide = yr.groupBy("grp").agg(
        F.max(F.when(F.col("y") == 1997, F.col("cents"))).alias("c97"),
        F.max(F.when(F.col("y") == 1998, F.col("cents"))).alias("c98"),
        F.max(F.when(F.col("y") == 1997, F.col("n"))).alias("n97"),
        F.max(F.when(F.col("y") == 1998, F.col("n"))).alias("n98"),
    )
    per = wide.select(
        "grp",
        "c97",
        "c98",
        F.expr("c98 * 1000 div n98 - c97 * 1000 div n97").alias("dplm"),
    )
    return per.agg(
        F.max(F.when(F.col("grp") == "promo", F.expr("c98 - c97"))).alias("promo_delta_cents"),
        F.max(F.when(F.col("grp") == "base", F.expr("c98 - c97"))).alias("base_delta_cents"),
        (
            F.max(F.when(F.col("grp") == "promo", F.col("dplm")))
            - F.max(F.when(F.col("grp") == "base", F.col("dplm")))
        ).alias("did_per_line_milli"),
    )


@register(
    "e_fano_burstiness",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, h
),
stats AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(c) AS BIGINT) AS s1,
    CAST(sum(c * c) AS BIGINT) AS s2
  FROM hourly GROUP BY event_type
)
SELECT event_type, n, s1 AS total_events,
  CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1) * 1000000
       // (n * s1) AS BIGINT) AS fano_ppm,
  CASE WHEN n * s2 - s1 * s1 < n * s1 THEN 'regular'
       WHEN n * s2 - s1 * s1 = n * s1 THEN 'poisson'
       ELSE 'bursty' END AS regime
FROM stats ORDER BY event_type
""",
    tags=("D8", "E3"),
)
def e_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean of hourly arrival counts): the
    burstiness diagnostic separating regular (F<1), Poisson (F=1)
    and bursty (F>1) traffic — capacity planning reads it before
    sizing for peaks. F = (n·S2 − S1²)/(n·S1) entirely in integers:
    the regime classification cross-multiplies, the reported value is
    scaled-numerator ppm in decimal(38,0) — exact to 1 ppm at any
    denominator magnitude. One hourly rollup, one tiny aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select("event_type", epoch_us("ts").alias("us"))
        .select("event_type", F.expr("us div 3600000000").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("c"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.expr("c * c")).alias("s2"),
    )
    # Scaled-NUMERATOR ppm in decimal(38,0): the earlier divide-the-
    # divisor form ((n·s2−s1²) div (n·s1 div 1e6)) collapses to the raw
    # numerator whenever n·s1 < 1e6 (true at every gate SF here — the
    # reported "ppm" was off 26× from the real Fano factor), a shared
    # engine+oracle bug caught by the round-5 independent-derivation
    # sweep (tests/test_indep_timeseries3_r5.py). decimal(38,0) gives the
    # ×1e6 numerator full headroom at any corpus scale.
    return stats.select(
        "event_type",
        "n",
        F.col("s1").alias("total_events"),
        F.expr(
            "cast((cast(n as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1)"
            " * 1000000 div (n * s1) as bigint)"
        ).alias("fano_ppm"),
        F.when(F.expr("n * s2 - s1 * s1 < n * s1"), "regular")
        .when(F.expr("n * s2 - s1 * s1 = n * s1"), "poisson")
        .otherwise("bursty")
        .alias("regime"),
    ).orderBy("event_type")


@register(
    "k_grouped_map_ols",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, h
),
idx AS (
  SELECT event_type, y,
    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h) AS BIGINT) AS x
  FROM hourly
),
stats AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM idx GROUP BY event_type
)
SELECT event_type, n,
  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS slope,
  round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
      / CAST(n AS DOUBLE), 6) AS intercept
FROM stats ORDER BY event_type
""",
    tags=("K3", "K2", "D8"),
)
def k_grouped_map_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group model fitting through the applyInPandas surface: an
    OLS trend (hourly cents vs hour index) fit INSIDE the Python
    worker per event type — the grouped-map shape every per-entity
    forecasting job uses. Determinism discipline: the pandas fn
    accumulates sufficient statistics as PYTHON INTEGERS (exact —
    numpy float64 dot products would be summation-order-dependent)
    and evaluates the closed form in the SAME floating-point
    operation sequence as the oracle, then one shared round.
    """
    import pandas as pd

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

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        # mirrors the oracle's SQL aggregate semantics exactly: x-sums
        # run over ALL rows, y-sums SKIP NULLs (SQL sum), an all-NULL y
        # gives NULL sums, and a zero denominator (single point /
        # zero-variance x) gives NULL slope — never a worker crash
        pdf = pdf.sort_values("h").reset_index(drop=True)
        ys = [None if pd.isna(v) else int(v) for v in pdf["y"]]
        n = len(ys)
        sx = sxx = 0
        sy = sxy = None
        for i, yv in enumerate(ys, start=1):
            sx += i
            sxx += i * i
            if yv is not None:
                sy = (sy or 0) + yv
                sxy = (sxy or 0) + i * yv
        den = float(n) * sxx - float(sx) * sx
        slope = (
            None
            if sy is None or den == 0
            else (float(n) * sxy - float(sx) * sy) / den
        )
        intercept = (
            None if slope is None else (float(sy) - slope * sx) / float(n)
        )
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n],
                "slope": [None if slope is None else round(slope, 6)],
                "intercept": [None if intercept is None else round(intercept, 6)],
            }
        )

    return (
        hourly.groupBy("event_type")
        .applyInPandas(fit, "event_type string, n long, slope double, intercept double")
        .orderBy("event_type")
    )
