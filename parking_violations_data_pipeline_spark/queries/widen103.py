"""Round-4 widening batch 103: salted two-phase aggregation (the
hot-key AGG fix, sibling of the salted join) and batched multi-query
kNN (N queries in one job, not N jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.vector import cosine_sim
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_salted_agg",
    oracle="""
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
  CAST(max(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS max_cents
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("D1", "C10"),
)
def d_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation — the hot-key fix for AGGREGATION
    (sibling of c_skew_salted_join): event_type has only 5 values, so
    a direct groupBy funnels the whole table through 5 reducers at
    scale. Phase 1 groups by (event_type, salt16) — 80 evenly-sized
    cells; phase 2 merges the 80 partials — every aggregate here is
    algebraically mergeable (count→sum, sum→sum, max→max). The result
    must equal the direct single-phase groupBy exactly (the oracle IS
    the direct form). Spark's partial aggregation does this implicitly
    per-partition; explicit salting is the control you reach for when
    one reducer still drowns (e.g. after a join re-shuffles on the hot
    key)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt"),
    )
    phase1 = e.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum("cents").alias("pcents"),
        F.max("cents").alias("pmax"),
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.sum("pcents").alias("cents"),
            F.max("pmax").alias("max_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "j_batch_knn",
    oracle="""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.qid, e.vec_id,
    round(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))
         / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_inner_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))), 4) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id, sim,
    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
  FROM scored
)
SELECT qid, vec_id, sim FROM ranked WHERE rn <= 3
ORDER BY qid, rn
""",
    tags=("J8", "J7"),
)
def j_batch_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query kNN: the top-3 neighbors for TEN query
    vectors from ONE job — the query frame broadcasts onto a single
    corpus scan (corpus × queries scored in the same stage) and a
    per-query rank window makes each cut. Launching one Spark job per
    query is the classic serving-layer mistake; the batched shape
    amortizes the scan across the whole query set, which is how
    offline retrieval evaluation actually runs. Rounding-before-rank
    contract as q_knn_cosine."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                cosine_sim(
                    F.col("embedding").cast("array<double>"),
                    F.col("qv").cast("array<double>"),
                ),
                4,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id", "sim")
        .orderBy("qid", F.desc("sim"), "vec_id")
    )
