"""Round-3 widening batch 11: market-style time-series bars (OHLC),
rolling-window distinct users (the WAU curve computed without a
window-distinct primitive), an ordered funnel with per-step timeouts,
and weight-aware medians at distinct-value grain.

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles rounded on both sides,
total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


@register(
    "q_ohlc_bars",
    oracle=f"""
WITH p AS (
  SELECT epoch_us(ts) // {HOUR_US} AS hour_id,
         ts, event_id, round(value, 2) AS v
  FROM events WHERE event_type = 'purchase'
),
ranked AS (
  SELECT hour_id, v,
    row_number() OVER (PARTITION BY hour_id ORDER BY ts, event_id)       AS rn_a,
    row_number() OVER (PARTITION BY hour_id ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM p
)
SELECT hour_id,
  CAST(count(*) AS BIGINT)                  AS n_trades,
  max(CASE WHEN rn_a = 1 THEN v END)        AS open,
  max(v)                                    AS high,
  min(v)                                    AS low,
  max(CASE WHEN rn_d = 1 THEN v END)        AS close,
  CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS volume_cents
FROM ranked GROUP BY hour_id ORDER BY hour_id
""",
    tags=("E2", "D7", "H2"),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars over the purchase stream — the canonical
    downsampling shape for tick/event series (open and close are
    position-dependent, high/low/volume are plain aggregates).

    Open/close come from two row_number passes over the SAME hour_id
    shuffle (asc and desc with a full (ts, event_id) tie-break), then
    one hash aggregate — a single exchange end to end, which is the
    plan that holds at 1000 executors. min_by/max_by on a (ts,
    event_id) struct would also work in Spark but has no exact DuckDB
    twin, so both engines run the identical rank formulation.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        (epoch_us(F.col("ts")) / HOUR_US).cast("long").alias("hour_id"),
        "ts",
        "event_id",
        F.round("value", 2).alias("v"),
    )
    w_a = W.partitionBy("hour_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_d = W.partitionBy("hour_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = p.select(
        "hour_id",
        "v",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return (
        ranked.groupBy("hour_id")
        .agg(
            F.count("*").alias("n_trades"),
            F.max(F.when(F.col("rn_a") == 1, F.col("v"))).alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("v"))).alias("close"),
            F.sum(F.round(F.col("v") * 100, 0).cast("long")).alias("volume_cents"),
        )
        .orderBy("hour_id")
    )


@register(
    "e_rolling_active_users",
    oracle=f"""
WITH active AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {DAY_US} AS day_id FROM events
),
bound AS (SELECT max(day_id) AS max_day FROM active),
contrib AS (
  SELECT DISTINCT user_id, d FROM (
    SELECT a.user_id,
           unnest(generate_series(a.day_id, least(a.day_id + 6, b.max_day))) AS d
    FROM active a, bound b
  )
),
wau AS (
  SELECT d AS day_id, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY d
),
dau AS (
  SELECT day_id, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY day_id
)
SELECT w.day_id, w.wau, coalesce(d.dau, 0) AS dau,
       round(coalesce(d.dau, 0) * 1.0 / w.wau, 4) AS stickiness
FROM wau w LEFT JOIN dau d ON w.day_id = d.day_id
ORDER BY w.day_id
""",
    tags=("E3", "D2", "G3"),
)
def e_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day (the WAU curve) — the
    metric SQL wants as `count(DISTINCT) OVER (RANGE 7 days)`, which
    neither Spark nor most engines support. The scalable rewrite:
    dedup to (user, day) grain first, then each active day CONTRIBUTES
    to the 7 days it keeps the user active for (a bounded explode,
    blow-up factor exactly 7), dedup contributions, count per day.
    Work is O(active_pairs × 7) regardless of raw event volume —
    the heavy dedup happens at the compressed grain.

    DAU rides the same `active` frame; stickiness = DAU/WAU is the
    daily engagement ratio. The spine is clipped to max_day so partial
    trailing windows at the right edge aren't reported.
    """
    e = load_table(spark, sf_dir, "events")
    active = e.select(
        "user_id", (epoch_us(F.col("ts")) / DAY_US).cast("long").alias("day_id")
    ).distinct()
    bound = active.agg(F.max("day_id").alias("max_day"))
    contrib = (
        active.crossJoin(F.broadcast(bound))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day_id"), F.least(F.col("day_id") + 6, F.col("max_day"))
                )
            ).alias("d"),
        )
        .distinct()
    )
    wau = contrib.groupBy(F.col("d").alias("day_id")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = active.groupBy("day_id").agg(F.count("*").alias("dau"))
    return (
        wau.join(dau, "day_id", "left")
        .select(
            "day_id",
            "wau",
            F.coalesce("dau", F.lit(0)).alias("dau"),
            F.round(
                F.coalesce("dau", F.lit(0)) / F.col("wau"), 4
            ).alias("stickiness"),
        )
        .orderBy("day_id")
    )


@register(
    "q_funnel_windowed",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
s1 AS (
  SELECT user_id, min(us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.us) AS t2
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.us > s1.t1 AND e.us <= s1.t1 + {24 * HOUR_US}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.us) AS t3
  FROM ev e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.us > s2.t2 AND e.us <= s2.t2 + {24 * HOUR_US}
  GROUP BY e.user_id
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
  (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_24h,
  (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_24h,
  round((SELECT count(*) FROM s3) * 1.0
        / nullif((SELECT count(*) FROM s1), 0), 4) AS conversion
""",
    tags=("E2", "C1", "D1"),
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with per-step timeouts: first view, then first
    click STRICTLY AFTER it within 24 h, then first purchase within
    24 h of that click. Unlike the unordered q_funnel, each stage is
    anchored to the previous stage's timestamp, so the dependency
    chain is sequential by construction.

    Each stage is a user-grain aggregate joined back to the events on
    the SAME user_id key — three equi-joins on one co-partitioned key,
    no window over raw events, no cross-stage data movement beyond the
    per-user scalars. The final scalars are three one-row aggregates
    cross-joined (driver-free, broadcast-trivial).
    """
    e = load_table(spark, sf_dir, "events")
    ev = e.select("user_id", "event_type", epoch_us(F.col("ts")).alias("us"))
    timeout = 24 * HOUR_US
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("us") > F.col("t1")) & (F.col("us") <= F.col("t1") + timeout))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("us") > F.col("t2")) & (F.col("us") <= F.col("t2") + timeout))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    n1 = s1.agg(F.count("*").alias("n_view"))
    n2 = s2.agg(F.count("*").alias("n_click_24h"))
    n3 = s3.agg(F.count("*").alias("n_purchase_24h"))
    return n1.crossJoin(n2).crossJoin(n3).select(
        "n_view",
        "n_click_24h",
        "n_purchase_24h",
        F.round(
            F.col("n_purchase_24h") / F.nullif(F.col("n_view"), F.lit(0)), 4
        ).alias("conversion"),
    )


@register(
    "d_weighted_median",
    oracle="""
WITH grain AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, cents, w,
    sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
    sum(w) OVER (PARTITION BY l_returnflag)                        AS totw
  FROM grain
)
SELECT l_returnflag,
  CAST(min(CASE WHEN cumw * 2 >= totw THEN cents END) AS BIGINT) AS median_cents,
  CAST(max(totw) AS BIGINT)                                      AS total_weight,
  CAST(count(*) AS BIGINT)                                       AS n_distinct_values
FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("D5", "E3"),
)
def d_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted median (lower weighted median: the smallest
    value whose cumulative weight reaches half the total) — quantity-
    weighted price midpoint per return flag. Integer comparison
    `cumw*2 >= totw` keeps the threshold exact; no 0.5·total double.

    The 100 TB shape: aggregate to DISTINCT-VALUE grain first (price
    cents × summed quantity), so the prefix-sum window runs over the
    compressed series, not the raw rows — same compression trick as
    d_ks_drift. Spark's percentile(col, p, freq) exists but its
    interpolation has no exact cross-engine twin; this formulation is
    definitionally identical on both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    grain = l.groupBy(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    w_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy("l_returnflag")
    cum = grain.select(
        "l_returnflag",
        "cents",
        "w",
        F.sum("w").over(w_cum).alias("cumw"),
        F.sum("w").over(w_all).alias("totw"),
    )
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.min(
                F.when(F.col("cumw") * 2 >= F.col("totw"), F.col("cents"))
            ).alias("median_cents"),
            F.max("totw").alias("total_weight"),
            F.count("*").alias("n_distinct_values"),
        )
        .orderBy("l_returnflag")
    )
