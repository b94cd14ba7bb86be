"""Round-4 widening batch 91: incremental view maintenance with
retractions (delta-merge == recompute, proven) and retrieval quality
metrics (precision@k / MRR) for the vector search stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "etl_ivm_retract",
    oracle="""
WITH base AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 7),
delta_ins AS (SELECT * FROM orders WHERE o_orderkey % 10 = 7),
delta_del AS (SELECT * FROM base WHERE o_orderkey % 10 = 3),
view_base AS (
  SELECT o_orderpriority AS pri, count(*) AS n,
    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM base GROUP BY pri
),
weighted_delta AS (
  SELECT o_orderpriority AS pri, 1 AS w,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
  FROM delta_ins
  UNION ALL
  SELECT o_orderpriority, -1,
    -CAST(round(o_totalprice * 100, 0) AS BIGINT)
  FROM delta_del
),
delta_agg AS (
  SELECT pri, sum(w) AS dn, sum(c) AS dc FROM weighted_delta GROUP BY pri
),
maintained AS (
  SELECT coalesce(v.pri, d.pri) AS pri,
    coalesce(v.n, 0) + coalesce(d.dn, 0) AS n,
    coalesce(v.cents, 0) + coalesce(d.dc, 0) AS cents
  FROM view_base v FULL JOIN delta_agg d ON v.pri = d.pri
),
truth AS (
  SELECT o_orderpriority AS pri, count(*) AS n,
    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM (
    SELECT * FROM base WHERE o_orderkey % 10 <> 3
    UNION ALL SELECT * FROM delta_ins
  ) GROUP BY pri
)
SELECT m.pri,
  CAST(m.n AS BIGINT) AS n_orders,
  CAST(m.cents AS BIGINT) AS cents,
  (m.n = t.n AND m.cents = t.cents) AS ivm_matches_recompute
FROM maintained m JOIN truth t ON m.pri = t.pri
WHERE m.n > 0
ORDER BY m.pri
""",
    tags=("D1", "G1", "L"),
)
def etl_ivm_retract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance with RETRACTIONS: a materialized
    per-priority aggregate is maintained by merging a weighted delta
    (+1 rows for inserts, −1 rows with negated measures for deletes)
    instead of recomputing — the Flink/Materialize algebra, and the
    only affordable way to keep a 100 TB rollup fresh under updates.
    The maintained view is then compared group-by-group against a
    full recompute of the post-delta table; the boolean must be TRUE
    everywhere. The delta aggregate touches only |delta| rows — the
    base table is read once for the initial view, never again."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = o.filter(F.col("o_orderkey") % 10 != 7)
    delta_ins = o.filter(F.col("o_orderkey") % 10 == 7)
    delta_del = base.filter(F.col("o_orderkey") % 10 == 3)
    view_base = base.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("cents")
    )
    weighted = delta_ins.select(
        F.col("o_orderpriority").alias("pri"),
        F.lit(1).alias("w"),
        cents.alias("c"),
    ).unionAll(
        delta_del.select(
            F.col("o_orderpriority").alias("pri"),
            F.lit(-1).alias("w"),
            (-cents).alias("c"),
        )
    )
    delta_agg = weighted.groupBy("pri").agg(
        F.sum("w").alias("dn"), F.sum("c").alias("dc")
    )
    maintained = (
        view_base.join(delta_agg, "pri", "full")
        .select(
            "pri",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (F.coalesce("cents", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias(
                "cents"
            ),
        )
    )
    truth = (
        base.filter(F.col("o_orderkey") % 10 != 3)
        .unionAll(delta_ins)
        .groupBy(F.col("o_orderpriority").alias("pri"))
        .agg(F.count("*").alias("tn"), F.sum(cents).alias("tcents"))
    )
    return (
        maintained.join(truth, "pri")
        .filter(F.col("n") > 0)
        .select(
            "pri",
            F.col("n").alias("n_orders"),
            "cents",
            (
                (F.col("n") == F.col("tn")) & (F.col("cents") == F.col("tcents"))
            ).alias("ivm_matches_recompute"),
        )
        .orderBy("pri")
    )


@register(
    "j_retrieval_metrics",
    oracle="""
WITH q AS (SELECT embedding AS qv, label AS qlabel FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, e.label, q.qlabel,
    round(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[]))
         / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_inner_product(CAST(q.qv AS DOUBLE[]), CAST(q.qv AS DOUBLE[])))), 4) AS sim
  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
),
topk AS (
  SELECT label = qlabel AS rel,
    row_number() OVER (ORDER BY sim DESC, vec_id) AS rnk
  FROM scored ORDER BY sim DESC, vec_id LIMIT 10
)
SELECT
  CAST(count(*) FILTER (WHERE rel) AS BIGINT) AS hits_at_10,
  CAST(count(*) FILTER (WHERE rel) * 1000000 // 10 AS BIGINT)
    AS precision_ppm,
  CAST(coalesce(1000000 // min(CASE WHEN rel THEN rnk END), 0) AS BIGINT)
    AS mrr_ppm
FROM topk
""",
    tags=("J8", "J10"),
)
def j_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality metrics over the vector stack: cosine top-10
    for the query vector, relevance = same label as the query, and the
    two integer-exact rank metrics an eval harness reports —
    precision@10 and MRR (reciprocal first-hit rank), both in ppm via
    integer division (NDCG's log discounts are deliberately out: the
    rank metrics stay bit-exact cross-engine). The top-k cut reuses
    the q_knn_cosine rounding contract (round(sim, 4) before
    ordering)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"), F.col("label").alias("qlabel")
    )
    from parking_violations_data_pipeline_spark.functions.vector import cosine_sim

    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (F.col("label") == F.col("qlabel")).alias("rel"),
            F.round(
                cosine_sim(
                    F.col("embedding").cast("array<double>"),
                    F.col("qv").cast("array<double>"),
                ),
                4,
            ).alias("sim"),
        )
    )
    from pyspark.sql import Window

    topk = (
        scored.orderBy(F.desc("sim"), "vec_id")
        .limit(10)
        .withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("sim"), "vec_id"))
        )
    )
    return topk.agg(
        F.count(F.when(F.col("rel"), 1)).alias("hits_at_10"),
        F.expr("count(CASE WHEN rel THEN 1 END) * 1000000 div 10").alias(
            "precision_ppm"
        ),
        F.coalesce(
            F.expr("1000000 div min(CASE WHEN rel THEN rnk END)"), F.lit(0)
        ).alias("mrr_ppm"),
    )
