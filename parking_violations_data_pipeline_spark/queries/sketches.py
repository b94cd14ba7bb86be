"""Sketch / approximation family (SURVEY.md §2 D3 extended) — the
100-TB toolkit where exact answers cost a full shuffle: approximate
quantiles, count-min frequency estimates, HLL sketches that UNION
across partitions/days (the property exact distinct counts lack).

Correctness protocol (round-2): sketch internals are engine-specific,
so each query computes its acceptance invariant INSIDE the Spark plan
(|approx − exact| / exact ≤ tol as a boolean, alongside the exact
value) and the DuckDB oracle reproduces the deterministic columns
(exact values + literal TRUE). The driver has no rows-only fallback —
every entry must carry an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_approx_percentile",
    oracle="""
SELECT l_returnflag,
  round(quantile_cont(l_extendedprice, 0.5), 6) AS med_exact,
  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_exact,
  TRUE AS ok_med, TRUE AS ok_p99
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("D5", "D3"),
)
def d_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 approx form: Greenwald-Khanna quantile sketch — mergeable
    across partitions, bounded memory; the per-day/per-shard quantile
    path at scale (exact percentile needs the whole group sorted).
    Emits the exact quantiles plus ok_* = |approx − exact|/exact ≤ 5%
    computed in-plan; the oracle reproduces exact + TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("med_exact"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("p99_exact"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("med_a"),
        F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(1000)).alias("p99_a"),
        F.count("l_extendedprice").alias("__n"),
    )
    return (
        agg.select(
            "l_returnflag",
            "med_exact",
            "p99_exact",
            # coalesce(TRUE): an all-NULL group has no quantile to
            # approximate (vacuously ok); try_divide keeps a zero
            # exact-median from aborting under ANSI; below ~50 rows the
            # element-vs-interpolated quantile gap is definitional, not
            # sketch error, so the bound is vacuously satisfied
            (
                (F.col("__n") < 50)
                | F.coalesce(
                    F.try_divide(
                        F.abs(F.col("med_a") - F.col("med_exact")),
                        F.abs("med_exact"),
                    )
                    <= 0.05,
                    F.lit(True),
                )
            ).alias("ok_med"),
            (
                (F.col("__n") < 50)
                | F.coalesce(
                    F.try_divide(
                        F.abs(F.col("p99_a") - F.col("p99_exact")),
                        F.abs("p99_exact"),
                    )
                    <= 0.05,
                    F.lit(True),
                )
            ).alias("ok_p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d_count_min_topk",
    oracle="""
SELECT w, cnt, TRUE AS sketch_ok FROM (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
        FROM documents)
  GROUP BY w ORDER BY cnt DESC, w LIMIT 5
) ORDER BY cnt DESC, w
""",
    tags=("D3", "J1"),
)
def d_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch build + heavy-hitter counts: the sketch is
    built in one mergeable pass; Spark exposes the build but no
    SQL-side probe, so the query reports the exact top-5 word counts
    (oracle-checkable) plus sketch_ok = the serialized sketch is
    non-empty — the one-pass mergeable build is the scale-relevant
    property."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", r"\s+")).alias("w")).filter(F.col("w") != "")
    top = [
        r.w
        for r in words.groupBy("w").count().orderBy(F.desc("count"), "w").limit(5).collect()
    ]
    sketch_ok = words.agg(
        F.count_min_sketch(F.col("w"), F.lit(0.001), F.lit(0.99), F.lit(42)).alias("cms")
    ).select((F.octet_length("cms") > 0).alias("sketch_ok"))
    return (
        words.filter(F.col("w").isin(top))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(sketch_ok))
        .orderBy(F.desc("cnt"), "w")
    )


@register(
    "d_hll_sketch_union",
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact
  FROM orders GROUP BY 1
)
SELECT month, exact, TRUE AS ok_month,
  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS total_exact,
  TRUE AS ok_total,
  (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_months
FROM m ORDER BY month
""",
    tags=("D3",),
)
def d_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches built per month then UNIONED into a total — the
    property that makes approximate distinct counting compositional at
    scale (count pre-aggregated days, merge at query time; exact
    distinct cannot be merged). Emits per-month exact counts plus
    ok_month / ok_total = estimate within 5% of exact, computed
    in-plan."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("exact"),
    )
    total_exact = o.agg(F.countDistinct("o_custkey").alias("total_exact"))
    merged = monthly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("total_approx"),
        F.count("*").alias("n_months"),
    )
    return (
        monthly.select(
            "month",
            "exact",
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("exact"))
                / F.col("exact")
                <= 0.05
            ).alias("ok_month"),
        )
        .crossJoin(F.broadcast(total_exact))
        .crossJoin(F.broadcast(merged))
        .select(
            "month",
            "exact",
            "ok_month",
            "total_exact",
            (
                F.abs(F.col("total_approx") - F.col("total_exact"))
                / F.col("total_exact")
                <= 0.05
            ).alias("ok_total"),
            "n_months",
        )
        .orderBy("month")
    )
