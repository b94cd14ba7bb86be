"""Round-4 widening batch 86: feature-hashing text vectorizer (the
hashing-trick embedder, md5-bucketed for cross-engine parity) and
explicit cache() reuse across two derived aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "j_feature_hashing",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
  FROM documents WHERE doc_id < 20
),
hashed AS (
  SELECT doc_id,
    substr(md5(w), 1, 1) AS bucket,
    CASE WHEN substr(md5(w), 2, 1) >= '8' THEN -1 ELSE 1 END AS sgn
  FROM tok WHERE len(w) >= 2
),
dims AS (
  SELECT doc_id, bucket, sum(sgn) AS v FROM hashed GROUP BY doc_id, bucket
)
SELECT doc_id,
  CAST(sum(abs(v)) AS BIGINT) AS l1_norm,
  CAST(count(*) FILTER (WHERE v <> 0) AS BIGINT) AS nnz_dims,
  CAST(sum(v) AS BIGINT) AS signed_total
FROM dims GROUP BY doc_id ORDER BY doc_id
""",
    tags=("J7", "H4"),
)
def j_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick vectorizer — the zero-vocabulary featurizer
    (Weinberger et al.) a pipeline uses when an embedding model is too
    expensive: each token hashes straight into one of 16 dimensions
    (first md5 hex digit) with a hash-derived sign (second digit ≥ '8'
    → −1), so the 'embedding' needs no vocabulary build, no model, and
    merges by addition. md5 is the cross-engine hash (the
    d_hash_collision_census convention — Spark xxhash64 and the
    oracle's hash() never agree). Emits per-document L1 norm, active
    dimensions, and the signed total; everything integer-exact. One
    explode + two hash-aggregates; the dimension key space is 16 —
    the shuffle carries almost nothing."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w")
    ).filter(F.length("w") >= 2)
    hashed = tok.select(
        "doc_id",
        F.substring(F.md5("w"), 1, 1).alias("bucket"),
        F.when(F.substring(F.md5("w"), 2, 1) >= "8", -1).otherwise(1).alias("sgn"),
    )
    dims = hashed.groupBy("doc_id", "bucket").agg(F.sum("sgn").alias("v"))
    return (
        dims.groupBy("doc_id")
        .agg(
            F.sum(F.abs("v")).alias("l1_norm"),
            F.count(F.when(F.col("v") != 0, 1)).alias("nnz_dims"),
            F.sum("v").alias("signed_total"),
        )
        .orderBy("doc_id")
    )


@register(
    "b_cached_reuse",
    oracle="""
WITH base AS (
  SELECT c.c_nationkey AS nk,
    count(*) AS n_orders,
    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY nk
)
SELECT
  CAST((SELECT count(*) FROM base) AS BIGINT) AS n_nations,
  CAST((SELECT max(cents) FROM base) AS BIGINT) AS top_nation_cents,
  CAST((SELECT sum(n_orders) FROM base) AS BIGINT) AS total_orders,
  CAST((SELECT sum(cents) FROM base) AS BIGINT) AS total_cents
""",
    tags=("B1", "D1"),
)
def b_cached_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cache() reuse: the per-nation rollup is materialized
    once (storage-level MEMORY_AND_DISK) and TWO derived aggregates
    read the cached frame instead of re-running the join — the
    dashboard pattern where one conformed rollup feeds many tiles.
    Without the cache each derived query re-scans orders+customer; a
    plan test pins InMemoryTableScan to prove the reuse is physical,
    not aspirational. unpersist() runs before returning so the gate's
    memory footprint is transient."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
        )
        .cache()
    )
    shape = base.agg(
        F.count("*").alias("n_nations"), F.max("cents").alias("top_nation_cents")
    )
    totals = base.agg(
        F.sum("n_orders").alias("total_orders"), F.sum("cents").alias("total_cents")
    )
    out = shape.crossJoin(totals)
    result = out.collect()  # force both reads through the cache
    base.unpersist()
    return local_df(
        spark,
        result,
        "n_nations long, top_nation_cents long, total_orders long, total_cents long",
    )
