"""Round-3 widening batch 32: macro/time-series analytics — trade
balance per nation (exports − imports over the 5-way edge build),
lag-k autocorrelation from exact integer sufficient statistics, and
maximum drawdown via running-max windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_trade_balance",
    oracle="""
WITH rev AS (
  SELECT sn.n_name AS src, cn.n_name AS dst,
    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  WHERE sn.n_name <> cn.n_name
  GROUP BY sn.n_name, cn.n_name
),
exports AS (SELECT src AS nation, CAST(sum(cents) AS BIGINT) AS exp_cents FROM rev GROUP BY src),
imports AS (SELECT dst AS nation, CAST(sum(cents) AS BIGINT) AS imp_cents FROM rev GROUP BY dst)
SELECT coalesce(e.nation, i.nation) AS nation,
  CAST(coalesce(e.exp_cents, 0) AS BIGINT) AS exp_cents,
  CAST(coalesce(i.imp_cents, 0) AS BIGINT) AS imp_cents,
  CAST(coalesce(e.exp_cents, 0) - coalesce(i.imp_cents, 0) AS BIGINT) AS balance_cents
FROM exports e FULL OUTER JOIN imports i ON e.nation = i.nation
ORDER BY balance_cents DESC, nation
""",
    tags=("C1", "C2", "D1", "J19"),
)
def q_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade balance per nation: cross-border revenue where the
    supplying nation exports and the customer nation imports;
    surplus = exports − imports — the macro view over the same
    5-way edge build as q_trade_pagerank (domestic flows excluded).
    The edge aggregate is the scale-bound stage; the balance fold is
    a full-outer join over ≤25-row sides.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst"))),
            c.c_nationkey == F.col("ck"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src"))),
            s.s_nationkey == F.col("sk"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum(cents).alias("cents"))
    )
    exports = rev.groupBy(F.col("src").alias("nation")).agg(F.sum("cents").alias("exp_cents"))
    imports = rev.groupBy(F.col("dst").alias("nation")).agg(F.sum("cents").alias("imp_cents"))
    return (
        exports.join(imports, "nation", "full_outer")
        .select(
            "nation",
            F.coalesce("exp_cents", F.lit(0)).alias("exp_cents"),
            F.coalesce("imp_cents", F.lit(0)).alias("imp_cents"),
            (F.coalesce("exp_cents", F.lit(0)) - F.coalesce("imp_cents", F.lit(0))).alias(
                "balance_cents"
            ),
        )
        .orderBy(F.desc("balance_cents"), "nation")
    )


@register(
    "e_autocorrelation",
    oracle="""
WITH hourly AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY h
),
lagged AS (
  SELECT 1 AS lag_k, cents AS x, lag(cents, 1) OVER (ORDER BY h) AS y FROM hourly
  UNION ALL
  SELECT 2, cents, lag(cents, 2) OVER (ORDER BY h) FROM hourly
  UNION ALL
  SELECT 3, cents, lag(cents, 3) OVER (ORDER BY h) FROM hourly
),
pairs AS (SELECT lag_k, x, y FROM lagged WHERE y IS NOT NULL),
stats AS (
  SELECT lag_k,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
    CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY lag_k
)
SELECT CAST(lag_k AS BIGINT) AS lag_k, n,
  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS acf_r
FROM stats ORDER BY lag_k
""",
    tags=("E2", "D8"),
)
def e_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-3) of the hourly purchase
    series — the seasonality/momentum diagnostic. Sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy) accumulate as EXACT
    bigints over lag-paired rows (the d_ttest_welch discipline:
    floating point only in the final closed-form expression, with an
    identical operation sequence on both engines, then one shared
    round). The lag pairing runs per-k on the compressed hourly
    series — three tiny windows, not three scans of events.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hourly = (
        e.select(
            epoch_us("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select(F.expr("us div 3600000000").alias("h"), "cents")
        .groupBy("h")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.orderBy("h")
    branches = [
        hourly.select(
            F.lit(k).alias("lag_k"),
            F.col("cents").alias("x"),
            F.lag("cents", k).over(w).alias("y"),
        )
        for k in (1, 2, 3)
    ]
    lagged = branches[0].unionByName(branches[1]).unionByName(branches[2])
    pairs = lagged.filter(F.col("y").isNotNull())
    stats = pairs.groupBy("lag_k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return stats.select(
        F.col("lag_k").cast("long").alias("lag_k"),
        "n",
        # try_divide: a zero-variance (or too-short) series has no
        # autocorrelation — NULL like DuckDB /0, not an ANSI abort
        F.round(
            F.try_divide(
                F.col("n").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy"),
                F.sqrt(
                    (
                        F.col("n").cast("double") * F.col("sxx")
                        - F.col("sx").cast("double") * F.col("sx")
                    )
                    * (
                        F.col("n").cast("double") * F.col("syy")
                        - F.col("sy").cast("double") * F.col("sy")
                    )
                ),
            ),
            6,
        ).alias("acf_r"),
    ).orderBy("lag_k")


@register(
    "e_max_drawdown",
    oracle="""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS d,
    CAST(sum(CASE WHEN event_type = 'purchase'
        THEN CAST(round(value * 100, 0) AS BIGINT)
        ELSE -CAST(round(value * 100, 0) AS BIGINT) END) AS BIGINT) AS net_cents
  FROM events WHERE event_type IN ('purchase', 'error') AND ts IS NOT NULL
  GROUP BY d
),
cums AS (
  SELECT d,
    sum(net_cents) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM daily
),
curve AS (
  SELECT d, cum,
    max(cum) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water
  FROM cums
)
SELECT
  CAST(count(*) AS BIGINT) AS n_days,
  CAST(max(high_water) AS BIGINT) AS peak_cents,
  CAST(max(high_water - cum) AS BIGINT) AS max_drawdown_cents,
  CAST(min(cum) AS BIGINT) AS trough_cents
FROM curve
""",
    tags=("E3", "D1"),
)
def e_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily net-revenue curve (purchases
    credit, errors debit): the largest peak-to-trough fall of the
    cumulative series — the risk metric every treasury/trading
    dashboard carries. Two stacked windows on ONE ordered pass
    (running sum, then running max of it); all integer cents, the
    windows run at daily grain after aggregation.
    """
    # the daily curve is event-time-indexed: NULL ts dropped both sides
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
        & F.col("ts").isNotNull()
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = (
        e.select(
            epoch_us("ts").alias("us"),
            F.when(F.col("event_type") == "purchase", cents).otherwise(-cents).alias("net"),
        )
        .select(F.expr("us div 86400000000").alias("d"), "net")
        .groupBy("d")
        .agg(F.sum("net").alias("net_cents"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = daily.select(
        "d",
        F.sum("net_cents").over(w).alias("cum"),
    ).select("d", "cum", F.max("cum").over(w).alias("high_water"))
    return curve.agg(
        F.count("*").alias("n_days"),
        F.max("high_water").alias("peak_cents"),
        F.max(F.col("high_water") - F.col("cum")).alias("max_drawdown_cents"),
        F.min("cum").alias("trough_cents"),
    )
