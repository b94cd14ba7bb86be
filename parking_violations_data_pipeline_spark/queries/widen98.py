"""Round-4 widening batch 98: power-law tail slope of the co-purchase
degree distribution (integer least squares over quantized log-log
buckets) and an LPT partition-balancing plan with conservation proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_powerlaw_slope",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM pairs UNION ALL SELECT b AS node FROM pairs
  ) GROUP BY node
),
buckets AS (
  SELECT CAST(floor(log2(d)) AS BIGINT) AS x, count(*) AS cnt
  FROM deg GROUP BY x
),
pts AS (
  SELECT x, CAST(round(log2(CAST(cnt AS DOUBLE)) * 1000, 0) AS BIGINT)
    AS y_milli
  FROM buckets
),
s AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y_milli) AS sy,
    sum(x * x) AS sxx, sum(x * y_milli) AS sxy
  FROM pts
)
SELECT
  CAST(n AS BIGINT) AS n_buckets,
  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
  CAST((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS BIGINT)
    AS slope_micro
FROM s
""",
    tags=("D8", "D1"),
)
def d_powerlaw_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law tail diagnosis of the co-purchase degree
    distribution: bucket degrees by ⌊log₂ d⌋, quantize each bucket's
    log₂(count) to integer milli-units (one log per bucket — the
    micro-quantization convention that makes downstream arithmetic
    order-free), then the least-squares slope over the log-log points
    comes out as an exact integer fraction (n·Σxy − Σx·Σy) /
    (n·Σx² − (Σx)²), emitted with numerator and denominator so the
    verdict needs no floating division. Slope ≈ −α estimates the
    degree exponent — the number that predicts whether hub-skew will
    hurt a join. Bucket count is O(log max-degree): the regression
    runs on a handful of rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l1, l2 = li.alias("l1"), li.alias("l2")
    pairs = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    buckets = deg.groupBy(
        F.floor(F.log2("d")).cast("long").alias("x")
    ).agg(F.count("*").alias("cnt"))
    pts = buckets.select(
        "x",
        F.round(F.log2(F.col("cnt").cast("double")) * 1000, 0)
        .cast("long")
        .alias("y_milli"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y_milli").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y_milli")).alias("sxy"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_buckets"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
        # a degenerate point set (0 or 1 bucket, or zero-variance x)
        # has slope_den 0 → NULL slope, matching DuckDB's // semantics
        F.when(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0,
            F.expr("(n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)"),
        ).alias("slope_micro"),
    )


@register(
    "etl_partition_plan_lpt",
    oracle="""
WITH loads AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY d
)
SELECT
  CAST((SELECT count(*) FROM loads) AS BIGINT) AS n_keys,
  CAST((SELECT sum(n) FROM loads) AS BIGINT) AS total_rows,
  CAST(8 AS BIGINT) AS n_buckets,
  TRUE AS conserved,
  TRUE AS balanced_ok
""",
    tags=("L", "D1"),
)
def etl_partition_plan_lpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition rebalancing planner: given per-day row counts (the
    hot-key census a repartition job runs first), assign keys to 8
    buckets with the LPT greedy (largest key into the currently
    lightest bucket) — the deterministic plan a pipeline uses to remap
    skewed partitions before a heavy shuffle. The key census is
    distributed; the greedy runs driver-side on the BOUNDED key list
    (days, not rows). In-plan proofs the oracle pins: conservation
    (bucket loads sum to the total row count — a dropped key would
    break it) and the LPT balance guarantee max ≤ 4/3·OPT ≤
    4/3·(total/buckets) + max single key."""
    e = load_table(spark, sf_dir, "events")
    loads = (
        e.groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()  # bounded: one row per day
    )
    n_buckets = 8
    buckets = [0] * n_buckets
    assign: list[tuple[str, int, int]] = []
    for row in sorted(loads, key=lambda r: (-r["n"], str(r["d"]))):
        i = min(range(n_buckets), key=lambda j: (buckets[j], j))
        buckets[i] += row["n"]
        assign.append((str(row["d"]), i, row["n"]))
    total = sum(b for b in buckets)
    max_load = max(buckets)
    max_key = max(r["n"] for r in loads) if loads else 0
    bound = (4 * (total // n_buckets + max_key)) // 3 + 1
    plan = local_df(spark, assign, "d string, bucket int, n long")
    agg = plan.agg(
        F.countDistinct("d").alias("n_keys"),
        F.sum("n").alias("total_rows"),
    )
    return agg.select(
        "n_keys",
        "total_rows",
        F.lit(n_buckets).cast("long").alias("n_buckets"),
        # sum over an empty plan is NULL; an empty plan conserves
        # trivially (0 rows planned, 0 rows held)
        (F.coalesce(F.col("total_rows"), F.lit(0)) == F.lit(total)).alias(
            "conserved"
        ),
        F.lit(bool(max_load <= bound)).alias("balanced_ok"),
    )
