"""Round-4 widening batch 88: position-based multi-touch attribution
with exact credit conservation, and Little's law verified as an exact
integral identity over the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_multi_touch_attribution",
    oracle="""
WITH touches AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('click', 'view', 'search')
),
conv AS (
  SELECT user_id,
    sum(CAST(round(value * 100, 0) AS BIGINT)) AS conv_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
path AS (
  SELECT t.user_id, t.event_type, c.conv_cents,
    row_number() OVER (PARTITION BY t.user_id ORDER BY t.us, t.event_id) AS pos,
    count(*) OVER (PARTITION BY t.user_id) AS n
  FROM touches t JOIN conv c ON t.user_id = c.user_id
),
credit AS (
  SELECT user_id, event_type, pos, n, conv_cents,
    conv_cents * 1000 // n
      + CASE WHEN pos = n THEN conv_cents * 1000 - (conv_cents * 1000 // n) * n
        ELSE 0 END AS credit_milli
  FROM path
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_touches,
  CAST(sum(credit_milli) AS BIGINT) AS credit_millicents,
  ((SELECT sum(credit_milli) FROM credit)
   = (SELECT sum(conv_cents) * 1000 FROM conv
      WHERE user_id IN (SELECT DISTINCT user_id FROM touches)))
    AS conserved
FROM credit GROUP BY event_type ORDER BY event_type
""",
    tags=("E1", "D1"),
)
def q_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution with EXACT conservation: each
    user's purchase revenue is split evenly across their click/view/
    search touches in millicents by integer division, and the division
    remainder is assigned to the LAST touch — so total credited
    millicents equals total converted revenue to the millicent, by
    construction, and the in-plan boolean proves it (the property
    float-divided attribution models silently lose). One path window
    per user + a broadcast-size conversion rollup."""
    e = load_table(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type").isin("click", "view", "search")).select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("us")
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "conv_cents"
            )
        )
    )
    w = Window.partitionBy("user_id")
    path = touches.join(conv, "user_id").select(
        "user_id",
        "event_type",
        "conv_cents",
        F.row_number().over(w.orderBy("us", "event_id")).alias("pos"),
        F.count("*").over(w).alias("n"),
    )
    credit = path.select(
        "user_id",
        "event_type",
        "conv_cents",
        (
            F.expr("conv_cents * 1000 div n")
            + F.when(
                F.col("pos") == F.col("n"),
                F.expr("conv_cents * 1000 - (conv_cents * 1000 div n) * n"),
            ).otherwise(0)
        ).alias("credit_milli"),
    )
    total_credit = credit.agg(F.sum("credit_milli").alias("tc"))
    total_conv = (
        conv.join(touches.select("user_id").distinct(), "user_id")
        .agg((F.sum("conv_cents") * 1000).alias("tv"))
    )
    check = total_credit.crossJoin(total_conv).select(
        (F.col("tc") == F.col("tv")).alias("conserved")
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum("credit_milli").alias("credit_millicents"),
        )
        .crossJoin(F.broadcast(check))
        .orderBy("event_type")
    )


@register(
    "q_littles_law",
    oracle="""
WITH sess AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
    min(epoch_us(ts)) AS st, max(epoch_us(ts)) + 1 AS en
  FROM events GROUP BY user_id, d
),
pts AS (
  SELECT st AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT en AS t, -1 FROM sess
),
sweep AS (
  SELECT t,
    sum(delta) OVER (ORDER BY t, delta DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc,
    lead(t) OVER (ORDER BY t, delta DESC) AS nxt
  FROM pts
)
SELECT
  CAST((SELECT count(*) FROM sess) AS BIGINT) AS n_sessions,
  CAST((SELECT sum(en - st) FROM sess) AS BIGINT) AS total_duration_us,
  CAST(coalesce(sum(conc * (nxt - t)), 0) AS BIGINT) AS concurrency_integral_us,
  ((SELECT sum(en - st) FROM sess)
   = coalesce(sum(conc * (nxt - t)), 0)) AS littles_law_holds,
  CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM sweep
""",
    tags=("E3", "D1"),
)
def q_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law as an exact integral identity: over the per-user
    daily activity sessions, the time-integral of the concurrency
    curve ∫N(t)dt must equal the sum of session durations — not
    approximately (the L = λW form with averages and divisions) but
    to the microsecond, because both sides count the same area. The
    sweep is the +1/−1 boundary technique (entry-before-exit tie
    order); the integral is Σ concurrency × segment length between
    consecutive boundaries. A pipeline uses the identity as the
    self-check that its concurrency monitor and its duration ledger
    agree."""
    e = load_table(spark, sf_dir, "events")
    sess = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        epoch_us(F.min("ts")).alias("st"),
        (epoch_us(F.max("ts")) + 1).alias("en"),
    )
    pts = sess.select(F.col("st").alias("t"), F.lit(1).alias("delta")).unionAll(
        sess.select(F.col("en").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("t", F.desc("delta"))
    sweep = pts.select(
        "t",
        F.sum("delta")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("conc"),
        F.lead("t").over(w).alias("nxt"),
    )
    totals = sess.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.col("en") - F.col("st")).alias("total_duration_us"),
    )
    integral = sweep.agg(
        F.coalesce(
            F.sum(F.col("conc") * (F.col("nxt") - F.col("t"))), F.lit(0)
        ).alias("concurrency_integral_us"),
        F.max("conc").alias("peak_concurrency"),
    )
    return totals.crossJoin(integral).select(
        "n_sessions",
        "total_duration_us",
        "concurrency_integral_us",
        (F.col("total_duration_us") == F.col("concurrency_integral_us")).alias(
            "littles_law_holds"
        ),
        "peak_concurrency",
    )
