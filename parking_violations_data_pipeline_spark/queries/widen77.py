"""Round-4 widening batch 77: the binned large-×-large range join
(interval containment as an equi-join on time bins) and an l-diversity
privacy audit to pair with t_k_anonymity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.operators.rangejoin import range_join_binned
from parking_violations_data_pipeline_spark.registry import register


@register(
    "c_range_join_binned",
    oracle="""
WITH p AS (
  SELECT epoch_us(ts) AS us, event_type AS ptype
  FROM events WHERE event_type = 'purchase'
),
iv AS (
  SELECT event_type AS wtype,
    min(epoch_us(ts)) AS st,
    max(epoch_us(ts)) + 1 AS en
  FROM events WHERE event_type <> 'purchase'
  GROUP BY event_type, CAST(ts AS DATE)
)
SELECT wtype,
  CAST(count(*) AS BIGINT) AS contained_pairs,
  CAST(count(DISTINCT us) AS BIGINT) AS distinct_purchases
FROM p JOIN iv ON p.us >= iv.st AND p.us < iv.en
GROUP BY wtype ORDER BY wtype
""",
    tags=("C7", "C1"),
)
def c_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-×-large range join WITHOUT an equality key: every purchase
    moment joined to every same-day activity window of the other event
    types that contains it. The broadcast-nested-loop shape
    (c_range_join) is impossible at scale when both sides grow, so the
    interval is exploded into the hour bins it covers and the join runs
    as a plain hash equi-join on the bin, with containment as a
    residual filter — see operators/rangejoin.py for the cost model.
    Each (point, interval) pair qualifies in exactly one bin (a point
    has one bin), so the result needs no dedup. Oracle is the direct
    theta join — feasible at gate scale, and proving the binned
    rewrite exactly preserves the pair set."""
    e = load_table(spark, sf_dir, "events")
    points = e.filter(F.col("event_type") == "purchase").select(
        epoch_us("ts").alias("us")
    )
    iv = (
        e.filter(F.col("event_type") != "purchase")
        .groupBy(
            F.col("event_type").alias("wtype"), F.to_date("ts").alias("d")
        )
        .agg(
            epoch_us(F.min("ts")).alias("st"),
            (epoch_us(F.max("ts")) + 1).alias("en"),
        )
        .drop("d")
    )
    hour_us = 3_600_000_000
    joined = range_join_binned(points, "us", iv, "st", "en", hour_us)
    return (
        joined.groupBy("wtype")
        .agg(
            F.count("*").alias("contained_pairs"),
            F.countDistinct("us").alias("distinct_purchases"),
        )
        .orderBy("wtype")
    )


@register(
    "t_l_diversity",
    oracle="""
WITH g AS (
  SELECT lang, n_chars // 500 AS size_bucket,
    count(*) AS k, count(DISTINCT source) AS l
  FROM documents GROUP BY lang, size_bucket
)
SELECT
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(min(k) AS BIGINT) AS min_k,
  CAST(min(l) AS BIGINT) AS min_l,
  CAST(count(*) FILTER (WHERE l < 2) AS BIGINT) AS n_low_diversity,
  CAST(coalesce(sum(k) FILTER (WHERE l < 2), 0) AS BIGINT) AS docs_at_risk
FROM g
""",
    tags=("J2", "D2"),
)
def t_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit, the companion to t_k_anonymity: within each
    quasi-identifier group (lang × 500-char size bucket), how many
    DISTINCT sensitive values (source) appear? A group can be
    k-anonymous yet still leak — if all its members share one source,
    membership reveals it. Emits the group census, worst-case k and l,
    and the rows exposed by homogeneous (l<2) groups. One
    hash-aggregate over the QI key then a scalar rollup of the tiny
    group frame."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(
        "lang", F.expr("n_chars div 500").alias("size_bucket")
    ).agg(
        F.count("*").alias("k"),
        F.countDistinct("source").alias("l"),
    )
    return g.agg(
        F.count("*").alias("n_groups"),
        F.min("k").alias("min_k"),
        F.min("l").alias("min_l"),
        F.count(F.when(F.col("l") < 2, 1)).alias("n_low_diversity"),
        F.coalesce(F.sum(F.when(F.col("l") < 2, F.col("k"))), F.lit(0)).alias(
            "docs_at_risk"
        ),
    )
