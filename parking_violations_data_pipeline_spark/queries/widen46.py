"""Round-3 widening batch 47: same-store (comparable-entity) growth
methodology and filtered vector search — pre-filter vs post-filter
top-k with the recall loss MEASURED in-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_same_store_growth",
    oracle="""
WITH yearly AS (
  SELECT o_custkey AS cust, year(o_orderdate) AS y,
    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE year(o_orderdate) IN (1997, 1998)
  GROUP BY cust, y
),
wide AS (
  SELECT cust,
    max(CASE WHEN y = 1997 THEN cents END) AS c97,
    max(CASE WHEN y = 1998 THEN cents END) AS c98
  FROM yearly GROUP BY cust
),
agg AS (
  SELECT
    CAST(sum(coalesce(c97, 0)) AS BIGINT) AS all_97,
    CAST(sum(coalesce(c98, 0)) AS BIGINT) AS all_98,
    CAST(sum(CASE WHEN c97 IS NOT NULL AND c98 IS NOT NULL THEN c97 ELSE 0 END) AS BIGINT) AS ss_97,
    CAST(sum(CASE WHEN c97 IS NOT NULL AND c98 IS NOT NULL THEN c98 ELSE 0 END) AS BIGINT) AS ss_98,
    CAST(sum(CASE WHEN c97 IS NOT NULL AND c98 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_comparable
  FROM wide
)
SELECT all_97, all_98, ss_97, ss_98, n_comparable,
  CAST((all_98 - all_97) * 1000000 // all_97 AS BIGINT) AS all_growth_ppm,
  CAST((ss_98 - ss_97) * 1000000 // ss_97 AS BIGINT) AS same_store_growth_ppm
FROM agg
""",
    tags=("D1", "B6"),
)
def q_same_store_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-store (comparable-customer) growth: total 1997→1998
    revenue growth versus growth restricted to customers active in
    BOTH years — the retail methodology that separates organic
    momentum from customer-base churn (all-in growth mixes both; the
    gap between the two numbers IS the acquisition/attrition
    effect). One customer-year rollup, one pivot, exact cents, ppm
    by floor division.
    """
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    yearly = (
        o.filter(y.isin(1997, 1998))
        .groupBy(F.col("o_custkey").alias("cust"), y.alias("y"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))
    )
    wide = yearly.groupBy("cust").agg(
        F.max(F.when(F.col("y") == 1997, F.col("cents"))).alias("c97"),
        F.max(F.when(F.col("y") == 1998, F.col("cents"))).alias("c98"),
    )
    both = F.col("c97").isNotNull() & F.col("c98").isNotNull()
    agg = wide.agg(
        F.sum(F.coalesce("c97", F.lit(0))).alias("all_97"),
        F.sum(F.coalesce("c98", F.lit(0))).alias("all_98"),
        F.sum(F.when(both, F.col("c97")).otherwise(0)).alias("ss_97"),
        F.sum(F.when(both, F.col("c98")).otherwise(0)).alias("ss_98"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_comparable"),
    )
    return agg.select(
        "all_97",
        "all_98",
        "ss_97",
        "ss_98",
        "n_comparable",
        F.expr("(all_98 - all_97) * 1000000 div all_97").alias("all_growth_ppm"),
        F.expr("(ss_98 - ss_97) * 1000000 div ss_97").alias("same_store_growth_ppm"),
    )


@register(
    "j_filtered_knn",
    oracle="""
WITH src AS MATERIALIZED (
  SELECT vec_id, label, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
  WHERE embedding IS NOT NULL
),
rel AS MATERIALIZED (
  -- 128-bit product sum: q·q reaches 1e20 on unnormalized embeddings
  SELECT b.vec_id, b.label, CAST(sum(CAST(a.q AS HUGEINT) * b.q) // 1000000 AS BIGINT) AS dot
  FROM src a JOIN src b ON a.i = b.i
  WHERE a.vec_id = 0 AND b.vec_id <> 0
  GROUP BY b.vec_id, b.label
),
target_label AS (SELECT label FROM embeddings WHERE vec_id = 0),
pre AS (
  SELECT vec_id, dot, row_number() OVER (ORDER BY dot DESC, vec_id) AS rn
  FROM rel WHERE label = (SELECT label FROM target_label)
),
post_pool AS (
  SELECT vec_id, label, dot, row_number() OVER (ORDER BY dot DESC, vec_id) AS rn
  FROM rel
),
post AS (
  SELECT vec_id, dot, row_number() OVER (ORDER BY dot DESC, vec_id) AS rn
  FROM post_pool WHERE rn <= 20 AND label = (SELECT label FROM target_label)
)
SELECT
  CAST((SELECT count(*) FROM pre WHERE rn <= 5) AS BIGINT) AS n_pre,
  CAST((SELECT count(*) FROM post WHERE rn <= 5) AS BIGINT) AS n_post,
  CAST((SELECT count(*) FROM pre p JOIN post q ON p.vec_id = q.vec_id
        WHERE p.rn <= 5 AND q.rn <= 5) AS BIGINT) AS n_overlap,
  CAST((SELECT count(*) FROM pre p JOIN post q ON p.vec_id = q.vec_id
        WHERE p.rn <= 5 AND q.rn <= 5) * 1000000 // 5 AS BIGINT) AS recall_ppm
""",
    tags=("J8", "J10", "F3"),
)
def j_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search, both strategies: PRE-filter (restrict
    to the query's label, then take top-5 — always returns 5 true
    neighbors) versus POST-filter (global top-20, then filter by
    label, then top-5 — the cheap strategy that LOSES results when
    the filter is selective). The in-plan recall of post vs pre is
    the number every vector store quotes when justifying filtered
    indexes; here it's MEASURED on exact integer dot products, so
    the comparison is about strategy, not index approximation.
    """
    e = load_table(spark, sf_dir, "embeddings")
    src = e.select(
        "vec_id", "label", F.posexplode(F.col("embedding")).alias("i0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("q"),
    )
    qv = src.filter(F.col("vec_id") == 0).select(
        F.col("i").alias("qi"), F.col("q").alias("qq")
    )
    rel = (
        src.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv), F.col("i") == F.col("qi"))
        .groupBy("vec_id", "label")
        .agg(
            F.expr(
                "CAST(sum(CAST(q AS DECIMAL(38,0)) * qq)"
                " div 1000000 AS LONG)"
            ).alias("dot")
        )
    )
    t_label = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("label").alias("t_label"))
        .distinct()  # a duplicated query row must stay ONE parameter
    )
    rel_l = rel.crossJoin(F.broadcast(t_label))
    w = Window.orderBy(F.desc("dot"), "vec_id")
    pre = (
        rel_l.filter(F.col("label") == F.col("t_label"))
        .select("vec_id", "dot", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )
    post_pool = rel_l.select(
        "vec_id", "label", "t_label", "dot", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 20)
    post = (
        post_pool.filter(F.col("label") == F.col("t_label"))
        .select("vec_id", "dot", F.row_number().over(w).alias("rn2"))
        .filter(F.col("rn2") <= 5)
    )
    n_pre = pre.count()
    n_post = post.count()
    n_overlap = pre.select("vec_id").join(post.select("vec_id"), "vec_id").count()
    # anchor on range(1), not a fixture table: the summary row must
    # exist even when every table is empty (the oracle's scalar
    # subqueries always yield one row)
    return spark.range(1).select(
        F.lit(n_pre).cast("long").alias("n_pre"),
        F.lit(n_post).cast("long").alias("n_post"),
        F.lit(n_overlap).cast("long").alias("n_overlap"),
        F.lit(n_overlap * 1000000 // 5).cast("long").alias("recall_ppm"),
    )
