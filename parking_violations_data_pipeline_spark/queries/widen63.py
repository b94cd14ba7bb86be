"""Round-3 widening batch 64: Durbin-Watson residual-autocorrelation
diagnostic (quantized residuals keep the statistic order-free) and
array set-operation parity (union / intersect / except sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_durbin_watson",
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
),
resid AS (
  -- residual numerator over common denominator n*D (which cancels in
  -- DW): R = y*n*D - sy*D + S*sx - S*n*x, S = n*sxy - sx*sy,
  -- D = n*sxx - sx*sx — all integer, scaled down 10^6 identically
  SELECT i.event_type, i.x,
    (CAST(i.y AS DECIMAL(38, 0)) * s.n * (s.n * s.sxx - s.sx * s.sx)
     - CAST(s.sy AS DECIMAL(38, 0)) * (s.n * s.sxx - s.sx * s.sx)
     + CAST(s.n * s.sxy - s.sx * s.sy AS DECIMAL(38, 0)) * s.sx
     - CAST(s.n * s.sxy - s.sx * s.sy AS DECIMAL(38, 0)) * s.n * i.x
    ) AS r_raw
  FROM idx i JOIN stats s ON i.event_type = s.event_type
),
scaled AS (
  SELECT event_type, x, CAST(trunc(r_raw / 1000000) AS DECIMAL(38, 0)) AS r
  FROM resid
),
lagged AS (
  SELECT event_type, r,
    lag(r) OVER (PARTITION BY event_type ORDER BY x) AS prev
  FROM scaled
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(trunc(
    sum(CASE WHEN prev IS NOT NULL THEN (r - prev) * (r - prev) ELSE 0 END)
    * 1000000 / greatest(sum(r * r), 1)) AS BIGINT) AS dw_micro
FROM lagged GROUP BY event_type ORDER BY event_type
""",
    tags=("D8", "E2"),
)
def d_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on the hourly-trend OLS residuals:
    DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² ≈ 2 when residuals are independent, → 0
    under positive autocorrelation — the diagnostic that says whether
    the k_grouped_map_ols trend line left structure on the table.
    Discipline: the residual numerator lives over the common
    denominator n·D, which CANCELS in the DW ratio — so the whole
    statistic evaluates in integer/decimal arithmetic with zero
    doubles anywhere (a double closed form diverged by one ulp on
    one row between engines, measured; integers cannot). Reported
    in micro units via floor division.
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
    w_rn = Window.partitionBy("event_type").orderBy("h")
    idx = hourly.select(
        "event_type", "y", F.row_number().over(w_rn).cast("long").alias("x")
    )
    stats = idx.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    # residual numerator over the common denominator n*D (cancels in
    # the DW ratio): all integer/decimal — zero doubles anywhere, so
    # no ulp can flip a quantization boundary (a double closed form
    # diverged by one ulp on one row between engines, measured)
    r_expr = (
        "(cast(y as decimal(38,0)) * n * (n * sxx - sx * sx)"
        " - cast(sy as decimal(38,0)) * (n * sxx - sx * sx)"
        " + cast(n * sxy - sx * sy as decimal(38,0)) * sx"
        " - cast(n * sxy - sx * sy as decimal(38,0)) * n * x"
        ") div 1000000"
    )
    resid = idx.join(F.broadcast(stats), "event_type").select(
        "event_type", "x", F.expr(r_expr).alias("r")
    )
    w = Window.partitionBy("event_type").orderBy("x")
    lagged = resid.select("event_type", "r", F.lag("r").over(w).alias("prev"))
    num_dec = (
        "sum(CASE WHEN prev IS NOT NULL"
        " THEN cast(r - prev as decimal(38,0)) * (r - prev) ELSE 0 END)"
    )
    den_dec = "sum(cast(r as decimal(38,0)) * r)"
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                f"cast({num_dec} * 1000000 div greatest({den_dec}, cast(1 as decimal(38,0))) as bigint)"
            ).alias("dw_micro"),
        )
        .orderBy("event_type")
    )


@register(
    "h_array_set_ops",
    oracle="""
WITH pairs AS (
  SELECT o_orderkey,
    [CAST(o_orderkey % 7 AS BIGINT), CAST(o_orderkey % 5 AS BIGINT),
     CAST(o_orderkey % 3 AS BIGINT)] AS a,
    [CAST(o_orderkey % 5 AS BIGINT), CAST(o_orderkey % 4 AS BIGINT),
     CAST(o_orderkey % 3 AS BIGINT)] AS b
  FROM orders
),
sized AS (
  SELECT
    len(list_distinct(list_concat(a, b))) AS u,
    len(list_intersect(list_distinct(a), list_distinct(b))) AS i,
    len(list_filter(list_distinct(a), x -> NOT list_contains(b, x))) AS d,
    len(list_filter(list_distinct(b), x -> NOT list_contains(a, x))) AS d2
  FROM pairs
)
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(u) AS BIGINT) AS sum_union_sz,
  CAST(sum(i) AS BIGINT) AS sum_intersect_sz,
  CAST(sum(d) AS BIGINT) AS sum_except_sz,
  bool_and(u = i + d + d2) AS inclusion_exclusion_ok
FROM sized
""",
    tags=("H5",),
)
def h_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation parity: per-row union / intersect / except
    sizes over derived integer arrays, plus the inclusion-exclusion
    identity |A∪B| = |A∩B| + |A\\B| + |B\\A| asserted row-wise — the
    set algebra ETL uses for tag columns. Spark's array_union /
    array_intersect / array_except dedupe their outputs; the oracle
    mirrors with list_distinct-based equivalents, so the sizes agree
    exactly.
    """
    o = load_table(spark, sf_dir, "orders")
    pairs = o.select(
        F.expr(
            "array(cast(o_orderkey % 7 as bigint), cast(o_orderkey % 5 as bigint),"
            " cast(o_orderkey % 3 as bigint))"
        ).alias("a"),
        F.expr(
            "array(cast(o_orderkey % 5 as bigint), cast(o_orderkey % 4 as bigint),"
            " cast(o_orderkey % 3 as bigint))"
        ).alias("b"),
    )
    sized = pairs.select(
        F.size(F.array_union("a", "b")).alias("u"),
        F.size(F.array_intersect("a", "b")).alias("i"),
        F.size(F.array_except("a", "b")).alias("d"),
        F.size(F.array_except("b", "a")).alias("d2"),
    )
    return sized.agg(
        F.count("*").alias("n_rows"),
        F.sum("u").alias("sum_union_sz"),
        F.sum("i").alias("sum_intersect_sz"),
        F.sum("d").alias("sum_except_sz"),
        F.bool_and(
            F.col("u") == F.col("i") + F.col("d") + F.col("d2")
        ).alias("inclusion_exclusion_ok"),
    )
