"""Round-3 widening batch 25: distributional analytics in exact
integer arithmetic — Gini coefficient (rank-weighted inequality),
change-point detection with cross-multiplied exact mean comparison
(no floating-point argmax flap), and the Kaplan-Meier-style user
life table (at-risk / churned counts per tenure age).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_gini_coefficient",
    oracle="""
WITH spend AS (
  SELECT c.c_nationkey AS nk,
    CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, o.o_custkey
),
ranked AS (
  SELECT nk, cents,
    row_number() OVER (PARTITION BY nk ORDER BY cents, nk) AS rk
  FROM spend
),
per_nation AS (
  SELECT nk,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cents) AS BIGINT) AS tot,
    CAST(sum(rk * cents) AS BIGINT) AS rank_mass
  FROM ranked GROUP BY nk
)
SELECT n.n_name AS nation, p.n AS n_customers,
  CAST((2 * p.rank_mass - (p.n + 1) * p.tot)
       // greatest(p.n * p.tot // 1000000, 1) AS BIGINT) AS gini_ppm
FROM per_nation p JOIN nation n ON p.nk = n.n_nationkey
ORDER BY gini_ppm DESC, nation
""",
    tags=("D1", "E1"),
)
def d_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend per nation — the
    rank-weighted inequality metric (G = (2·Σ rᵢxᵢ − (n+1)·Σxᵢ) /
    (n·Σxᵢ) over ascending-sorted values): complements
    d_hhi_concentration (share²) with the full-distribution view.
    The rank window orders by (cents, nationkey-local row identity)
    — ties in spend get distinct ranks, but Σ rᵢxᵢ is invariant
    under permutation WITHIN a tie group (equal x), so the metric is
    deterministic anyway; everything stays on bigint grids with one
    final ppm floor division.

    Scale: the customer-grain rollup reduces first; the rank window
    shuffles once per nation partition — never a global sort.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        o.join(maybe_broadcast(c.select("c_custkey", "c_nationkey"), sf_dir, "customer"), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))
    )
    rk = F.row_number().over(Window.partitionBy("nk").orderBy("cents", "nk"))
    ranked = spend.select("nk", "cents", rk.alias("rk"))
    per_nation = ranked.groupBy("nk").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("tot"),
        F.sum(F.col("rk") * F.col("cents")).alias("rank_mass"),
    )
    return (
        per_nation.join(F.broadcast(n), per_nation.nk == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_customers"),
            # divide by the DOWN-scaled denominator instead of up-scaling
            # the numerator ×10⁶ — numerator ≈ G·n·tot would overflow
            # bigint at larger SFs; identical integer algebra both sides
            F.expr(
                "(2 * rank_mass - (n + 1) * tot)"
                " div greatest(n * tot div 1000000, 1)"
            ).alias("gini_ppm"),
        )
        .orderBy(F.desc("gini_ppm"), "nation")
    )


@register(
    "e_changepoint_meanshift",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
    CAST(count(*) AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY h
),
idx AS (
  SELECT h, cents, n,
    row_number() OVER (ORDER BY h) AS t,
    sum(cents) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
    sum(n) OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
    sum(cents) OVER () AS tot_c,
    sum(n) OVER () AS tot_n,
    count(*) OVER () AS n_hours
  FROM hourly
),
cand AS (
  SELECT h, t,
    abs((cum_c * (tot_n - cum_n)) - ((tot_c - cum_c) * cum_n)) AS num,
    cum_n * (tot_n - cum_n) AS den
  FROM idx WHERE t < n_hours AND cum_n > 0 AND tot_n > cum_n
),
best AS (
  SELECT h, CAST(num * 100 // den AS BIGINT) AS shift_centicents,
    row_number() OVER (ORDER BY num * 1000 // den DESC, h) AS pick
  FROM cand
)
SELECT CAST(h AS BIGINT) AS split_hour, shift_centicents
FROM best WHERE pick = 1
""",
    tags=("E3", "D1"),
)
def e_changepoint_meanshift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection: the split hour maximizing the absolute
    mean-shift |mean(before) − mean(after)| of purchase value. The
    argmax compares mean differences as FRACTIONS via
    cross-multiplication (|cum_c·(totN−cumN) − (tot_c−cum_c)·cumN|
    against cumN·(totN−cumN)) scaled to a common integer grid — a
    double-valued argmax could flip between engines on ulps; integer
    cross-products cannot. One running-sum pass over the compressed
    hourly series (the d_ks_drift shape: windows at aggregated
    grain, never event grain), total-order tie-break on hour.
    """
    # the hourly series is indexed by event time: NULL ts has no
    # hour — dropped on both sides
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    )
    hourly = (
        e.select(
            epoch_us("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select(F.expr("us div 3600000000").alias("h"), "cents")
        .groupBy("h")
        .agg(F.sum("cents").alias("cents"), F.count("*").alias("n"))
    )
    w_cum = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    idx = hourly.select(
        "h",
        F.row_number().over(Window.orderBy("h")).alias("t"),
        F.sum("cents").over(w_cum).alias("cum_c"),
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("cents").over(w_all).alias("tot_c"),
        F.sum("n").over(w_all).alias("tot_n"),
        F.count("*").over(w_all).alias("n_hours"),
    )
    cand = idx.filter(
        (F.col("t") < F.col("n_hours")) & (F.col("cum_n") > 0) & (F.col("tot_n") > F.col("cum_n"))
    ).select(
        "h",
        F.abs(
            F.col("cum_c") * (F.col("tot_n") - F.col("cum_n"))
            - (F.col("tot_c") - F.col("cum_c")) * F.col("cum_n")
        ).alias("num"),
        (F.col("cum_n") * (F.col("tot_n") - F.col("cum_n"))).alias("den"),
    )
    pick = F.row_number().over(Window.orderBy(F.expr("num * 1000 div den").desc(), "h"))
    return (
        cand.select(
            "h",
            F.expr("num * 100 div den").alias("shift_centicents"),
            pick.alias("pick"),
        )
        .filter(F.col("pick") == 1)
        .select(F.col("h").cast("long").alias("split_hour"), "shift_centicents")
    )


@register(
    "q_user_life_table",
    oracle="""
WITH life AS (
  SELECT user_id,
    min(epoch_us(ts)) // 86400000000 AS d0,
    max(epoch_us(ts)) // 86400000000 AS d1
  FROM events GROUP BY user_id
),
ages AS (
  SELECT user_id, CAST(d1 - d0 AS BIGINT) AS last_age
  FROM life
),
per_age AS (
  SELECT last_age AS age, CAST(count(*) AS BIGINT) AS n_churned
  FROM ages GROUP BY last_age
),
curve AS (
  SELECT age, n_churned,
    CAST(sum(n_churned) OVER (ORDER BY age
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_at_risk
  FROM per_age
)
SELECT age, n_at_risk, n_churned,
  CAST((n_at_risk - n_churned) * 1000000 // n_at_risk AS BIGINT) AS survive_ppm
FROM curve ORDER BY age
""",
    tags=("D1", "E3", "H2"),
)
def q_user_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier-style life table at day-of-tenure grain (the
    fixtures span ~30 days, so days give the curve its resolution):
    each user's observed lifetime is last-event-day − first-event-day;
    per tenure age the table reports the at-risk population (users
    who survived INTO the day), churn count, and the conditional
    survival fraction in ppm — the retention-curve primitive.
    n_at_risk derives from one suffix sum over the (tiny) per-age
    churn histogram, so the user-grain shuffle happens exactly once
    and the source is scanned exactly once; integer day arithmetic
    is TZ-free on both engines.
    """
    e = load_table(spark, sf_dir, "events")
    life = (
        e.select("user_id", epoch_us("ts").alias("us"))
        .groupBy("user_id")
        .agg(
            F.expr("min(us) div 86400000000").alias("d0"),
            F.expr("max(us) div 86400000000").alias("d1"),
        )
    )
    ages = life.select(F.expr("d1 - d0").alias("last_age"))
    per_age = ages.groupBy(F.col("last_age").alias("age")).agg(
        F.count("*").alias("n_churned")
    )
    # at-risk = users surviving INTO the age = suffix sum of the churn
    # histogram — one events scan, one user shuffle, no separate
    # total-count branch (the cross-join form re-scanned the source)
    suffix = Window.orderBy("age").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    curve = per_age.select(
        "age",
        "n_churned",
        F.sum("n_churned").over(suffix).alias("n_at_risk"),
    )
    return curve.select(
        "age",
        "n_at_risk",
        "n_churned",
        F.expr("(n_at_risk - n_churned) * 1000000 div n_at_risk").alias("survive_ppm"),
    ).orderBy("age")
