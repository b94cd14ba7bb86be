"""Round-3 widening batch 9: two-proportion A/B testing, pipeline
stage auditing (row-count observability), and label-confusion mining
over embeddings.

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles rounded on both sides,
total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_ab_proportions_ztest",
    oracle="""
WITH assign AS (
  SELECT user_id,
         min(CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END) AS grp,
         CAST(max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS BIGINT)
           AS converted
  FROM events GROUP BY user_id
),
cells AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS conv
  FROM assign GROUP BY grp
),
wide AS (
  SELECT
    max(CASE WHEN grp = 'A' THEN n END)    AS n_a,
    max(CASE WHEN grp = 'A' THEN conv END) AS conv_a,
    max(CASE WHEN grp = 'B' THEN n END)    AS n_b,
    max(CASE WHEN grp = 'B' THEN conv END) AS conv_b
  FROM cells
)
SELECT n_a, conv_a, n_b, conv_b,
  round(conv_a * 1.0 / n_a, 6) AS p_a,
  round(conv_b * 1.0 / n_b, 6) AS p_b,
  round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
        / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
               * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
               * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score
FROM wide
""",
    tags=("D1", "B6"),
)
def d_ab_proportions_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the experiment-analysis primitive:
    split users into deterministic A/B arms (user_id parity; in
    production, the assignment hash), measure per-user conversion
    (any purchase above 150), and test the difference under the pooled standard
    error. Completes the hypothesis-testing shelf: KS/Mann-Whitney for
    numerics, chi² for categories, this for conversion rates.

    Per-user conversion is ONE aggregation at user grain (max of an
    indicator — dedups multiple purchases without a distinct), the
    2×2 cells are a second tiny aggregation, and the pivot to one row
    is conditional max — no joins, no second scan of events. All
    arithmetic is integer until the final ratios.
    """
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B")
        ).alias("grp"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") > 150), 1).otherwise(0)
        ).alias("converted"),
    )
    cells = assign.groupBy("grp").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = cells.agg(
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == "A", F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == "B", F.col("conv"))).alias("conv_b"),
    )
    # try_divide throughout: a missing arm (n_a/n_b NULL or 0 on a
    # degenerate feed) must yield NULL ratios, matching the oracle's
    # SQL `/` which is NULL-on-zero in DuckDB — not an ANSI abort
    p_a = F.try_divide(F.col("conv_a"), F.col("n_a"))
    p_b = F.try_divide(F.col("conv_b"), F.col("n_b"))
    pool = F.try_divide(
        F.col("conv_a") + F.col("conv_b"), F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool
        * (1 - pool)
        * (F.try_divide(F.lit(1.0), F.col("n_a"))
           + F.try_divide(F.lit(1.0), F.col("n_b")))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(F.try_divide(p_a - p_b, se), 4).alias("z_score"),
    )


@register(
    "etl_stage_row_audit",
    oracle="""
WITH src AS (SELECT * FROM events),
typed AS (
  SELECT user_id, event_type, value FROM src
  WHERE value IS NOT NULL AND value > 0
),
deduped AS (
  SELECT user_id, event_type, max(value) AS value
  FROM typed GROUP BY user_id, event_type
),
enriched AS (
  SELECT d.*, c.c_mktsegment FROM deduped d
  JOIN customer c ON c.c_custkey = d.user_id % 1500 + 1
)
SELECT stage, rows, round(pct_of_source, 4) AS pct_of_source
FROM (
  SELECT 0 AS ord, 'source'   AS stage, CAST(count(*) AS BIGINT) AS rows,
         100.0 AS pct_of_source FROM src
  UNION ALL
  SELECT 1, 'typed_valid', CAST(count(*) AS BIGINT),
         count(*) * 100.0 / (SELECT count(*) FROM src) FROM typed
  UNION ALL
  SELECT 2, 'deduped', CAST(count(*) AS BIGINT),
         count(*) * 100.0 / (SELECT count(*) FROM src) FROM deduped
  UNION ALL
  SELECT 3, 'enriched', CAST(count(*) AS BIGINT),
         count(*) * 100.0 / (SELECT count(*) FROM src) FROM enriched
) ORDER BY ord
""",
    tags=("A5", "B5", "D1"),
)
def etl_stage_row_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability: row counts and source-relative
    percentages at every stage of a clean→dedup→enrich pipeline, in
    one job — the audit trail that catches a filter eating 40% of a
    feed before the bad batch ships.

    Each stage is declared once and reused (Catalyst shares the
    subplans); the four counts union into a 4-row report. At 100 TB
    this replaces four separate audit queries with one pass per
    distinct stage — and because the counts come from the SAME plan
    that produces the data, they cannot drift from what actually ran.
    The enrich stage maps user_id onto the customer key range so the
    join is a real (broadcast) dim join with a knowable hit rate.
    """
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    src = e
    typed = src.filter(F.col("value").isNotNull() & (F.col("value") > 0)).select(
        "user_id", "event_type", "value"
    )
    deduped = typed.groupBy("user_id", "event_type").agg(
        F.max("value").alias("value")
    )
    enriched = deduped.join(
        maybe_broadcast(c.select("c_custkey", "c_mktsegment"), sf_dir, "customer"),
        F.col("c_custkey") == F.col("user_id") % 1500 + 1,
    )
    n_src = src.agg(F.count("*").alias("n"))

    def stage(df: DataFrame, ord_: int, name: str) -> DataFrame:
        return (
            df.agg(F.count("*").alias("rows"))
            .crossJoin(F.broadcast(n_src))
            .select(
                F.lit(ord_).alias("ord"),
                F.lit(name).alias("stage"),
                "rows",
                # source is 100.0 BY DEFINITION (as in the oracle);
                # downstream stages use try_divide so an empty source
                # (n=0) reports NULL pcts, matching DuckDB's
                # NULL-on-zero division
                (
                    F.lit(100.0)
                    if ord_ == 0
                    else F.round(
                        F.try_divide(F.col("rows") * 100.0, F.col("n")), 4
                    )
                ).alias("pct_of_source"),
            )
        )

    report = (
        stage(src, 0, "source")
        .unionByName(stage(typed, 1, "typed_valid"))
        .unionByName(stage(deduped, 2, "deduped"))
        .unionByName(stage(enriched, 3, "enriched"))
    )
    return report.orderBy("ord").select("stage", "rows", "pct_of_source")


@register(
    "j_label_confusion",
    oracle="""
WITH dims AS (
  SELECT label, vec_id,
         unnest(embedding) AS x,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
),
cent AS (
  SELECT label, dim, avg(CAST(x AS DOUBLE)) AS c
  FROM dims GROUP BY label, dim
),
cnorm AS (
  SELECT label, dim, c / sqrt(sum(c * c) OVER (PARTITION BY label)) AS cu
  FROM cent
),
vec_cos AS (
  SELECT d.vec_id, d.label, n.label AS other_label,
         sum(CAST(d.x AS DOUBLE) * n.cu)
           / sqrt(sum(CAST(d.x AS DOUBLE) * CAST(d.x AS DOUBLE))) AS cos_c
  FROM dims d JOIN cnorm n ON n.dim = d.dim AND n.label <> d.label
  GROUP BY d.vec_id, d.label, n.label
),
hardest AS (
  SELECT vec_id, label, other_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(cos_c, 6) DESC, other_label) AS rn
  FROM vec_cos
)
SELECT label, other_label AS confused_with,
  CAST(count(*) AS BIGINT) AS n_vecs
FROM hardest WHERE rn = 1
GROUP BY label, other_label ORDER BY label, confused_with
""",
    tags=("J10", "J7", "C1"),
)
def j_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-confusion mining — the contrastive-training diagnostic:
    for every vector, which OTHER label's (unit-normalized) centroid
    is it most similar to? The per-(label, confused_with) counts form
    a nearest-rival confusion matrix that flags label pairs needing
    hard negatives, without any vector-vector comparison.

    Cost is O(n × labels × dim) via the dim-grain join against the
    tiny centroid table — the scalable stand-in for O(n²) hard-negative
    search. Centroids are L2-normalized so the vector's own norm
    divides out identically on both engines; the rival ranking orders
    by round(cos, 6) with the label as tie-break, making the argmax
    deterministic under ulp noise.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        "vec_id",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "label",
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    cent = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    cnorm = cent.select(
        "label",
        "dim",
        (
            F.col("c")
            / F.sqrt(F.sum(F.col("c") * F.col("c")).over(W.partitionBy("label")))
        ).alias("cu"),
    )
    n = cnorm.select(
        F.col("label").alias("other_label"), "dim", "cu"
    )
    vec_cos = (
        dims.join(F.broadcast(n), (n.dim == dims.dim) & (n.other_label != dims.label))
        .drop(n.dim)
        .groupBy("vec_id", "label", "other_label")
        .agg(
            (
                F.sum(F.col("x") * F.col("cu"))
                / F.sqrt(F.sum(F.col("x") * F.col("x")))
            ).alias("cos_c")
        )
    )
    hardest = vec_cos.select(
        "vec_id",
        "label",
        "other_label",
        F.row_number()
        .over(
            W.partitionBy("vec_id").orderBy(
                F.desc(F.round("cos_c", 6)), "other_label"
            )
        )
        .alias("rn"),
    )
    return (
        hardest.filter(F.col("rn") == 1)
        .groupBy("label", F.col("other_label").alias("confused_with"))
        .agg(F.count("*").alias("n_vecs"))
        .orderBy("label", "confused_with")
    )
