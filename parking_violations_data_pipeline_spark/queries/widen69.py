"""Round-3 widening batch 70: Matryoshka retrieval recall — how much
of the full-dimension top-k the truncated-prefix embedding retains,
measured exactly on integer dot products (the decision metric for
MRL truncation levels, completing j_matryoshka_energy's variance
view with the retrieval view).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "j_matryoshka_recall",
    oracle="""
WITH src AS MATERIALIZED (
  SELECT vec_id, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
  WHERE embedding IS NOT NULL
),
dots AS MATERIALIZED (
  SELECT b.vec_id,
    -- 128-bit product sums: q·q reaches 1e20 on unnormalized embeddings
    CAST(sum(CAST(a.q AS HUGEINT) * b.q) // 1000000 AS BIGINT) AS dot_full,
    CAST(sum(CASE WHEN a.i <= 8 THEN CAST(a.q AS HUGEINT) * b.q ELSE 0 END) // 1000000 AS BIGINT) AS dot_8
  FROM src a JOIN src b ON a.i = b.i
  WHERE a.vec_id = 0 AND b.vec_id <> 0
  GROUP BY b.vec_id
),
top_full AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (ORDER BY dot_full DESC, vec_id) AS rn FROM dots
  ) WHERE rn <= 10
),
top_8 AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (ORDER BY dot_8 DESC, vec_id) AS rn FROM dots
  ) WHERE rn <= 10
)
SELECT
  CAST((SELECT count(*) FROM top_full) AS BIGINT) AS k,
  CAST((SELECT count(*) FROM top_full f JOIN top_8 e ON f.vec_id = e.vec_id) AS BIGINT)
    AS n_overlap,
  CAST((SELECT count(*) FROM top_full f JOIN top_8 e ON f.vec_id = e.vec_id)
       * 1000000 // 10 AS BIGINT) AS recall_ppm
""",
    tags=("J10", "J8", "F3"),
)
def j_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka retrieval recall: the top-10 neighbors of the query
    under the TRUNCATED 8-dim prefix versus under the full 64 dims,
    overlap measured exactly — the number that decides whether an
    MRL prefix is good enough to serve retrieval (the variance view,
    j_matryoshka_energy, says how much ENERGY the prefix keeps; this
    says how much of the ANSWER it keeps — the operational
    question). Both rankings derive from one dot-product scan (the
    prefix dot is a conditional sum inside the same aggregate — no
    second pass), integer micro-units, vec_id tie-breaks.
    """
    e = load_table(spark, sf_dir, "embeddings")
    src = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("i0", "x")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("q"),
    )
    qv = src.filter(F.col("vec_id") == 0).select(
        F.col("i").alias("qi"), F.col("q").alias("qq")
    )
    dots = (
        src.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv), F.col("i") == F.col("qi"))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "CAST(sum(CAST(q AS DECIMAL(38,0)) * qq)"
                " div 1000000 AS LONG)"
            ).alias("dot_full"),
            F.expr(
                "CAST(sum(CASE WHEN i <= 8 THEN CAST(q AS DECIMAL(38,0)) * qq"
                " ELSE 0 END) div 1000000 AS LONG)"
            ).alias("dot_8"),
        )
    )
    top_full = (
        dots.select(
            "vec_id", F.row_number().over(Window.orderBy(F.desc("dot_full"), "vec_id")).alias("rn")
        )
        .filter(F.col("rn") <= 10)
        .select("vec_id")
    )
    top_8 = (
        dots.select(
            "vec_id", F.row_number().over(Window.orderBy(F.desc("dot_8"), "vec_id")).alias("rn")
        )
        .filter(F.col("rn") <= 10)
        .select(F.col("vec_id").alias("v8"))
    )
    n_overlap = top_full.join(top_8, top_full.vec_id == F.col("v8")).count()
    # k is MEASURED (min(10, corpus size) — the oracle counts its own
    # top list); the summary row anchors on range(1) so it exists even
    # on an empty corpus
    k = top_full.count()
    return spark.range(1).select(
        F.lit(k).cast("long").alias("k"),
        F.lit(n_overlap).cast("long").alias("n_overlap"),
        F.lit(n_overlap * 1000000 // 10).cast("long").alias("recall_ppm"),
    )
