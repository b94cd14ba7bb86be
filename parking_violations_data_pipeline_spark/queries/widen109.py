"""Round-4 widening batch 109: customer spend decile migration — the
year-over-year rank-transition matrix portfolio teams watch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_decile_migration",
    oracle="""
WITH spend AS (
  SELECT o_custkey AS ck, year(o_orderdate) AS y,
    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY ck, y
),
deciles AS (
  SELECT ck, y,
    ntile(10) OVER (PARTITION BY y ORDER BY cents, ck) AS dec
  FROM spend
),
moves AS (
  SELECT a.dec AS from_dec, b.dec AS to_dec
  FROM deciles a JOIN deciles b ON a.ck = b.ck
  WHERE a.y = 1995 AND b.y = 1996
)
SELECT
  CAST(count(*) AS BIGINT) AS n_customers,
  CAST(count(*) FILTER (WHERE to_dec > from_dec) AS BIGINT) AS n_up,
  CAST(count(*) FILTER (WHERE to_dec < from_dec) AS BIGINT) AS n_down,
  CAST(count(*) FILTER (WHERE to_dec = from_dec) AS BIGINT) AS n_stable,
  CAST(count(*) FILTER (WHERE from_dec >= 9 AND to_dec <= 2) AS BIGINT)
    AS n_collapsed,
  CAST(sum(to_dec - from_dec) AS BIGINT) AS net_drift
FROM moves
""",
    tags=("E1", "C1", "D1"),
)
def q_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-decile migration 1995 → 1996 (round-5 fix: the original
    1994 → 1995 pair was vacuous — the orders fixture spans 1995-2001,
    so the entry measured an EMPTY transition set at every SF and
    stayed green only because the oracle agreed on the empty answer;
    caught by the independent-derivation sweep,
    tests/test_indep_growth_r5.py): every customer active in
    both years is ranked into spend deciles WITHIN each year
    (ntile(10) with full-key (cents, custkey) order — the rank-exact
    tie rule that makes decile membership deterministic), then the
    transition census: movers up, movers down, holders, and the
    top-to-bottom collapses a portfolio review flags first. The net
    drift sums to a number the two marginal distributions constrain —
    per-year deciles are near-uniform so the drift reflects real
    rank churn, not cohort size shift. Two rank windows on one year
    shuffle + a self-join on customer."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    spend = o.groupBy(
        F.col("o_custkey").alias("ck"), F.year("o_orderdate").alias("y")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    deciles = spend.select(
        "ck",
        "y",
        F.ntile(10).over(Window.partitionBy("y").orderBy("cents", "ck")).alias(
            "dec"
        ),
    )
    a = deciles.filter(F.col("y") == 1995).select(
        "ck", F.col("dec").alias("from_dec")
    )
    b = deciles.filter(F.col("y") == 1996).select(
        "ck", F.col("dec").alias("to_dec")
    )
    moves = a.join(b, "ck")
    return moves.agg(
        F.count("*").alias("n_customers"),
        F.count(F.when(F.col("to_dec") > F.col("from_dec"), 1)).alias("n_up"),
        F.count(F.when(F.col("to_dec") < F.col("from_dec"), 1)).alias("n_down"),
        F.count(F.when(F.col("to_dec") == F.col("from_dec"), 1)).alias(
            "n_stable"
        ),
        F.count(
            F.when((F.col("from_dec") >= 9) & (F.col("to_dec") <= 2), 1)
        ).alias("n_collapsed"),
        F.sum(F.col("to_dec") - F.col("from_dec")).alias("net_drift"),
    )
