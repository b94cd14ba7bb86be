"""Round-3 widening batch 42: scenario-grid evaluation in one scan,
forecast accuracy (WAPE/bias vs a seasonal-naive baseline), and
pointwise mutual information per contingency cell (per-cell rounding
dodges the cross-cell double-summation-order trap that blocks a
single-number MI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_scenario_sweep",
    oracle="""
WITH scen AS (SELECT unnest(generate_series(0, 4)) AS s),
swept AS (
  SELECT s.s * 5 AS extra_disc_pct,
    CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents,
    CAST(round(l.l_discount * 100, 0) AS BIGINT) + s.s * 5 AS disc_pct
  FROM lineitem l CROSS JOIN scen s
)
SELECT CAST(extra_disc_pct AS BIGINT) AS extra_disc_pct,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(cents * (100 - least(disc_pct, 100)) // 100) AS BIGINT) AS net_cents
FROM swept GROUP BY extra_disc_pct ORDER BY extra_disc_pct
""",
    tags=("D1", "H3", "B6"),
)
def q_scenario_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scenario-grid evaluation in ONE scan: five extra-discount
    scenarios (+0% … +20%) priced against every lineitem via a
    5-row broadcast grid instead of five separate jobs — the what-if
    sweep pattern (grid × facts → per-scenario aggregate) that keeps
    parameter studies O(1 scan). Net revenue per scenario in exact
    integer cents with a clamped discount (least(d, 100)); the
    explode factor is the scenario count, absorbed map-side by
    partial aggregation.
    """
    l = load_table(spark, sf_dir, "lineitem")
    scen = spark.range(0, 5).select((F.col("id") * 5).cast("long").alias("extra"))
    swept = l.select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("base_disc"),
    ).crossJoin(F.broadcast(scen))
    return (
        swept.groupBy(F.col("extra").alias("extra_disc_pct"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(
                F.expr("cents * (100 - least(base_disc + extra, 100)) div 100")
            ).alias("net_cents"),
        )
        .orderBy("extra_disc_pct")
    )


@register(
    "e_forecast_wape",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, h
),
paired AS (
  SELECT event_type, y,
    lag(y, 168) OVER (PARTITION BY event_type ORDER BY h) AS yhat
  FROM hourly
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_forecasts,
  CAST(sum(abs(y - yhat)) AS BIGINT) AS abs_err_cents,
  CAST(sum(y - yhat) AS BIGINT) AS bias_cents,
  CAST(sum(abs(y - yhat)) * 1000000 // sum(y) AS BIGINT) AS wape_ppm
FROM paired WHERE yhat IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
    tags=("E2", "D1"),
)
def e_forecast_wape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast accuracy against the seasonal-naive baseline (ŷ = the
    same hour one week earlier, lag 168): WAPE (Σ|err|/Σactual, the
    scale-free accuracy number planners quote) and signed bias —
    the evaluation every demand-forecast pipeline runs, and the
    baseline any model must beat. Integer cents end-to-end; the lag
    rides the hourly series on one event_type shuffle; warm-up hours
    without a week-old twin are excluded identically via the NULL
    lag.
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
    w = Window.partitionBy("event_type").orderBy("h")
    paired = hourly.select(
        "event_type", "y", F.lag("y", 168).over(w).alias("yhat")
    ).filter(F.col("yhat").isNotNull())
    return (
        paired.groupBy("event_type")
        .agg(
            F.count("*").alias("n_forecasts"),
            F.sum(F.abs(F.col("y") - F.col("yhat"))).alias("abs_err_cents"),
            F.sum(F.col("y") - F.col("yhat")).alias("bias_cents"),
            F.expr("sum(abs(y - yhat)) * 1000000 div sum(y)").alias("wape_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "d_pmi_cells",
    oracle="""
WITH cells AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls, CAST(count(*) AS BIGINT) AS o
  FROM lineitem GROUP BY rf, ls
),
m AS (
  SELECT rf, ls, o,
    CAST(sum(o) OVER (PARTITION BY rf) AS BIGINT) AS n_rf,
    CAST(sum(o) OVER (PARTITION BY ls) AS BIGINT) AS n_ls,
    CAST(sum(o) OVER () AS BIGINT) AS n
  FROM cells
)
SELECT rf, ls, o,
  round(ln((CAST(o AS DOUBLE) * n) / (CAST(n_rf AS DOUBLE) * n_ls)), 6) AS pmi
FROM m ORDER BY rf, ls
""",
    tags=("D8", "D1"),
)
def d_pmi_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information per (returnflag, linestatus)
    cell: ln(p(x,y)/(p(x)p(y))) — which combinations co-occur more
    than independence predicts. Reported PER CELL rather than summed
    into one MI number deliberately: a cross-cell double sum is
    summation-order-dependent between engines, while each cell's
    PMI is one ln() of an exactly-agreed rational (integer counts on
    both sides of the division), rounded once. The margins come from
    windows over the tiny cell table.
    """
    l = load_table(spark, sf_dir, "lineitem")
    cells = l.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count("*").alias("o"))
    m = cells.select(
        "rf",
        "ls",
        "o",
        F.sum("o").over(Window.partitionBy("rf")).alias("n_rf"),
        F.sum("o").over(Window.partitionBy("ls")).alias("n_ls"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    return m.select(
        "rf",
        "ls",
        "o",
        F.round(
            F.log(
                (F.col("o").cast("double") * F.col("n"))
                / (F.col("n_rf").cast("double") * F.col("n_ls"))
            ),
            6,
        ).alias("pmi"),
    ).orderBy("rf", "ls")
