"""Round-4 widening batch 99: nearest-neighbor as-of join (completing
backward/forward/tolerance/bitemporal) and a capstone report query
that composes joins, windows, conditional aggregation and ranking in
one exactly-oracled plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "c_asof_nearest",
    oracle="""
WITH p AS (
  SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
c AS (
  SELECT user_id, epoch_us(ts) AS cus, event_id AS cid
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
),
cand AS (
  SELECT p.pid, p.pus, c.cus, c.cid,
    abs(p.pus - c.cus) AS dist,
    row_number() OVER (PARTITION BY p.pid
                       ORDER BY abs(p.pus - c.cus), c.cus, c.cid) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
)
SELECT
  CAST(count(*) AS BIGINT) AS n_matched,
  CAST(sum(dist) AS BIGINT) AS total_dist_us,
  CAST(max(dist) AS BIGINT) AS max_dist_us,
  CAST(count(*) FILTER (WHERE cus <= pus) AS BIGINT) AS n_backward
FROM cand WHERE rn = 1
""",
    tags=("C8", "E1"),
)
def c_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join — the variant backward/forward
    can't express: each purchase matches its temporally CLOSEST click
    (either side), ties broken toward the earlier click then by id.
    Implementation is the per-user equi-join + argmin window (the
    shuffle key bounds candidates to one user's events — never a time
    cross-product); pandas merge_asof(direction='nearest') is the
    single-node analogue. Emits the matched-pair census and how often
    the nearest click was in the past (backward share) — at 100 TB
    the same plan holds because the window partitions by the purchase
    id after a user-key shuffle."""
    # an as-of match needs a real event time on BOTH sides: NULL-ts
    # rows dropped (both engine and oracle)
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        epoch_us("ts").alias("pus"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        epoch_us("ts").alias("cus"),
        F.col("event_id").alias("cid"),
    )
    cand = p.join(c, "user_id").select(
        "pid",
        "pus",
        "cus",
        "cid",
        F.abs(F.col("pus") - F.col("cus")).alias("dist"),
    )
    w = Window.partitionBy("pid").orderBy("dist", "cus", "cid")
    best = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return best.agg(
        F.count("*").alias("n_matched"),
        F.sum("dist").alias("total_dist_us"),
        F.max("dist").alias("max_dist_us"),
        F.count(F.when(F.col("cus") <= F.col("pus"), 1)).alias("n_backward"),
    )


@register(
    "q_capstone_report",
    oracle="""
WITH fact AS (
  SELECT r.r_name AS region, strftime(o.o_orderdate, '%Y-%m') AS month,
    p.p_brand AS brand,
    CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
      AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-01-01'
),
rm AS (
  SELECT region, month, sum(cents) AS cents, count(*) AS n_lines
  FROM fact GROUP BY region, month
),
brand_rm AS (
  SELECT region, month, brand, sum(cents) AS bcents
  FROM fact GROUP BY region, month, brand
),
top_brand AS (
  SELECT region, month, brand AS top_brand
  FROM (
    SELECT region, month, brand,
      row_number() OVER (PARTITION BY region, month
                         ORDER BY bcents DESC, brand) AS rn
    FROM brand_rm
  ) WHERE rn = 1
),
shared AS (
  SELECT rm.region, rm.month, rm.cents, rm.n_lines,
    sum(rm.cents) OVER (PARTITION BY rm.region) AS region_total,
    row_number() OVER (PARTITION BY rm.region
                       ORDER BY rm.cents DESC, rm.month) AS month_rank
  FROM rm
)
SELECT s.region, s.month,
  CAST(s.cents AS BIGINT) AS cents,
  CAST(s.n_lines AS BIGINT) AS n_lines,
  CAST(s.cents * 1000000 // s.region_total AS BIGINT) AS share_ppm,
  CAST(s.month_rank AS BIGINT) AS month_rank,
  t.top_brand
FROM shared s JOIN top_brand t
  ON s.region = t.region AND s.month = t.month
WHERE s.month_rank <= 3
ORDER BY s.region, s.month_rank
""",
    tags=("C1", "C3", "E1", "D1", "F3"),
)
def q_capstone_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analyst's monster report in one plan: 1995 revenue at
    (region, month) grain through the full 6-table star, each
    region's top-3 months by revenue with their share of the region's
    year (integer ppm) and the best-selling brand of that month
    (rank-deterministic argmax). Composition audit: one fact scan
    feeds BOTH rollup grains; the dims broadcast; the share and rank
    windows reuse the region partitioning; the brand argmax is a
    window over the finer rollup, not a second scan. The kind of
    query every surface of §2 has to serve at once — scan pruning,
    broadcast joins, two-level aggregation, analytic windows,
    ranked top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    fact = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                li["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(cu, sf_dir, "customer"), o["o_custkey"] == cu["c_custkey"])
        .join(F.broadcast(n), cu["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(maybe_broadcast(pt, sf_dir, "part"), li["l_partkey"] == pt["p_partkey"])
        .select(
            F.col("r_name").alias("region"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.col("p_brand").alias("brand"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    brand_rm = fact.groupBy("region", "month", "brand").agg(
        F.sum("cents").alias("bcents"), F.count("*").alias("bn")
    )
    rm = brand_rm.groupBy("region", "month").agg(
        F.sum("bcents").alias("cents"), F.sum("bn").alias("n_lines")
    )
    wb = Window.partitionBy("region", "month").orderBy(F.desc("bcents"), "brand")
    top_brand = (
        brand_rm.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("region", "month", F.col("brand").alias("top_brand"))
    )
    wr = Window.partitionBy("region")
    shared = rm.select(
        "region",
        "month",
        "cents",
        "n_lines",
        F.sum("cents").over(wr).alias("region_total"),
        F.row_number().over(wr.orderBy(F.desc("cents"), "month")).alias(
            "month_rank"
        ),
    )
    return (
        shared.filter(F.col("month_rank") <= 3)
        .join(top_brand, ["region", "month"])
        .select(
            "region",
            "month",
            "cents",
            "n_lines",
            F.expr("cents * 1000000 div region_total").alias("share_ppm"),
            F.col("month_rank").cast("long").alias("month_rank"),
            "top_brand",
        )
        .orderBy("region", "month_rank")
    )
