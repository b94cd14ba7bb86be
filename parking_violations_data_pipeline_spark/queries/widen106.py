"""Round-4 widening batch 106: symmetric difference — the set-op the
G family's except/intersect pair composes but never names, with the
inclusion-exclusion identity proven in-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "g_symmetric_diff",
    oracle="""
WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
b AS (SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')),
onlya AS (SELECT k FROM a EXCEPT SELECT k FROM b),
onlyb AS (SELECT k FROM b EXCEPT SELECT k FROM a),
inboth AS (SELECT k FROM a INTERSECT SELECT k FROM b)
SELECT
  CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
  CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
  CAST((SELECT count(*) FROM onlya) + (SELECT count(*) FROM onlyb)
       AS BIGINT) AS n_sym_diff,
  CAST((SELECT count(*) FROM inboth) AS BIGINT) AS n_both,
  ((SELECT count(*) FROM a) + (SELECT count(*) FROM b)
   = (SELECT count(*) FROM onlya) + (SELECT count(*) FROM onlyb)
     + 2 * (SELECT count(*) FROM inboth)) AS inclusion_exclusion_ok
""",
    tags=("G2", "D2"),
)
def g_symmetric_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference between two customer sets (urgent/high
    buyers vs high/medium buyers): customers in EXACTLY one set —
    composed as (A∖B) ∪ (B∖A) with the inclusion–exclusion law
    |A| + |B| = |AΔB| + 2·|A∩B| proven in-plan (the identity that
    catches a dedup bug in either EXCEPT branch). All four set ops
    shuffle on the same key — Catalyst plans them as left-anti /
    left-semi joins over one exchange shape."""
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    b = (
        o.filter(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"))
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    only_a = a.exceptAll(b)
    only_b = b.exceptAll(a)
    both = a.intersect(b)
    return (
        a.agg(F.count("*").alias("n_a"))
        .crossJoin(b.agg(F.count("*").alias("n_b")))
        .crossJoin(
            only_a.unionAll(only_b).agg(F.count("*").alias("n_sym_diff"))
        )
        .crossJoin(both.agg(F.count("*").alias("n_both")))
        .select(
            "n_a",
            "n_b",
            "n_sym_diff",
            "n_both",
            (
                F.col("n_a") + F.col("n_b")
                == F.col("n_sym_diff") + 2 * F.col("n_both")
            ).alias("inclusion_exclusion_ok"),
        )
    )
