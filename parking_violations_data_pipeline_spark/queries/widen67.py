"""Round-3 widening batch 68: pipeline volume-anomaly detection
(rank-exact median ± MAD on daily row counts — the robust ops
monitor) and a hash-space collision census (exact, since both
engines share md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "etl_volume_anomaly",
    oracle="""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS d, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY d
),
med AS (
  SELECT d, c, row_number() OVER (ORDER BY c, d) AS rn, count(*) OVER () AS n
  FROM daily
),
m AS (SELECT max(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med FROM med),
dev AS (
  SELECT daily.d, daily.c, abs(daily.c - m.med) AS ad, m.med
  FROM daily CROSS JOIN m
),
mad_rank AS (
  SELECT d, c, ad, med,
    row_number() OVER (ORDER BY ad, d) AS rn, count(*) OVER () AS n
  FROM dev
),
mad AS (
  SELECT max(med) AS med,
    max(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad
  FROM mad_rank
)
SELECT
  CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
  CAST(mad.med AS BIGINT) AS median_daily_rows,
  CAST(mad.mad AS BIGINT) AS mad_rows,
  CAST((SELECT count(*) FROM dev, mad WHERE dev.ad > 3 * mad.mad) AS BIGINT)
    AS n_anomalous_days
FROM mad
""",
    tags=("L", "D5", "B5"),
)
def etl_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline volume-anomaly monitor: daily row counts screened
    against median ± 3·MAD — the robust alert every ingestion
    pipeline runs (mean ± σ gets dragged by the very outliers it
    should catch; the median/MAD pair doesn't). Both statistics are
    rank-exact at ⌈n/2⌉ (the discrete-quantile house rule), the
    deviation test is pure integer comparison, and the report is the
    one-row health summary a scheduler gates on.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(epoch_us("ts").alias("us"))
        .select(F.expr("us div 86400000000").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("c"))
    )
    w_rank = Window.orderBy("c", "d")
    w_all = Window.partitionBy()
    med_t = daily.select(
        "d", "c", F.row_number().over(w_rank).alias("rn"), F.count("*").over(w_all).alias("n")
    )
    med = med_t.agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("c"))).alias("med")
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        "d", "c", F.abs(F.col("c") - F.col("med")).alias("ad"), "med"
    )
    w_rank2 = Window.orderBy("ad", "d")
    mad_t = dev.select(
        "ad", "med", F.row_number().over(w_rank2).alias("rn"), F.count("*").over(w_all).alias("n")
    )
    mad = mad_t.agg(
        F.max("med").alias("med"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("ad"))).alias("mad"),
    )
    flagged = (
        dev.crossJoin(F.broadcast(mad.select(F.col("mad").alias("mad_v"))))
        .filter(F.col("ad") > 3 * F.col("mad_v"))
        .count()
    )
    n_days = daily.count()
    out = mad.select(
        F.lit(n_days).cast("long").alias("n_days"),
        F.col("med").alias("median_daily_rows"),
        F.col("mad").alias("mad_rows"),
        F.lit(flagged).cast("long").alias("n_anomalous_days"),
    )
    return out


@register(
    "d_hash_collision_census",
    oracle="""
WITH pfx AS (
  SELECT substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) AS p
  FROM (SELECT DISTINCT o_orderkey FROM orders)
),
buckets AS (
  SELECT p, CAST(count(*) AS BIGINT) AS k FROM pfx GROUP BY p
)
SELECT
  CAST(sum(k) AS BIGINT) AS n_keys,
  CAST(count(*) AS BIGINT) AS n_distinct_prefixes,
  CAST(sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT) AS n_colliding_keys,
  CAST(max(k) AS BIGINT) AS max_bucket
FROM buckets
""",
    tags=("H4", "D2"),
)
def d_hash_collision_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-space collision census: order keys mapped through a
    16-bit hash prefix (4 md5 hex chars → 65 536 slots) and the
    collision load measured exactly — the capacity check before
    committing to a short-hash partition key or cache shard (the
    birthday bound says ~n²/2m collisions; the census MEASURES the
    fixture's actual figure, bit-identical on both engines because
    md5 is shared). max_bucket is the hot-slot answer.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey").distinct()
    pfx = o.select(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4).alias("p")
    )
    buckets = pfx.groupBy("p").agg(F.count("*").alias("k"))
    return buckets.agg(
        F.sum("k").alias("n_keys"),
        F.count("*").alias("n_distinct_prefixes"),
        F.sum(F.when(F.col("k") > 1, F.col("k")).otherwise(0)).alias("n_colliding_keys"),
        F.max("k").alias("max_bucket"),
    )
