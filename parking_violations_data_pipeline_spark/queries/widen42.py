"""Round-3 widening batch 43: exact distribution moments (skewness /
excess kurtosis from decimal-wide power sums — engines' builtin
skewness/kurtosis disagree on bias correction, sufficient statistics
don't) and per-dimension embedding standardization (z-scoring, the
feature-prep step before distance-based models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_moments_exact",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IN ('purchase', 'click')
),
s AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS s1,
    CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR) AS s2_str,
    CAST(sum(CAST(x AS HUGEINT) * x * x) AS VARCHAR) AS s3_str,
    CAST(sum(CAST(x AS HUGEINT) * x * x * x) AS VARCHAR) AS s4_str
  FROM v GROUP BY event_type
),
m AS (
  SELECT event_type, n, s1,
    CAST(s2_str AS DOUBLE) AS s2, CAST(s3_str AS DOUBLE) AS s3,
    CAST(s4_str AS DOUBLE) AS s4,
    CAST(s1 AS DOUBLE) / n AS mu
  FROM s
),
c AS (
  SELECT event_type, n,
    s2 / n - mu * mu AS m2,
    s3 / n - 3 * mu * (s2 / n) + 2 * mu * mu * mu AS m3,
    s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu * mu * mu * mu AS m4
  FROM m
)
SELECT event_type, n,
  round(m3 / pow(m2, 1.5), 6) AS skewness,
  round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
FROM c ORDER BY event_type
""",
    tags=("D8", "D1"),
)
def d_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis from EXACT power sums: Σx² Σx³ Σx⁴
    accumulate in decimal(38)/HUGEINT (x³ terms alone pass bigint
    range), then the central-moment closed forms evaluate once in
    doubles with an identical operation sequence — the engines'
    BUILT-IN skewness()/kurtosis() disagree across systems on bias
    correction (population vs sample, Fisher vs Pearson), which is
    exactly why a cross-engine pipeline pins the sufficient-statistic
    formulation instead. Population (biased) moments, one shared
    round. The wide sums cross the comparator as strings (the hash
    layer has no int128 type); the doubles derive from them
    identically.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    v = e.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("x")
    )
    s = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x")).cast("string").alias("s2_str"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x * x")).cast("string").alias("s3_str"),
        F.sum(F.expr("cast(x as decimal(38,0)) * x * x * x")).cast("string").alias("s4_str"),
    )
    m = s.select(
        "event_type",
        "n",
        "s1",
        F.col("s2_str").cast("double").alias("s2"),
        F.col("s3_str").cast("double").alias("s3"),
        F.col("s4_str").cast("double").alias("s4"),
        (F.col("s1").cast("double") / F.col("n")).alias("mu"),
    )
    c = m.select(
        "event_type",
        "n",
        (F.col("s2") / F.col("n") - F.col("mu") * F.col("mu")).alias("m2"),
        (
            F.col("s3") / F.col("n")
            - 3 * F.col("mu") * (F.col("s2") / F.col("n"))
            + 2 * F.col("mu") * F.col("mu") * F.col("mu")
        ).alias("m3"),
        (
            F.col("s4") / F.col("n")
            - 4 * F.col("mu") * (F.col("s3") / F.col("n"))
            + 6 * F.col("mu") * F.col("mu") * (F.col("s2") / F.col("n"))
            - 3 * F.col("mu") * F.col("mu") * F.col("mu") * F.col("mu")
        ).alias("m4"),
    )
    return c.select(
        "event_type",
        "n",
        # zero variance → moments undefined → NULL (DuckDB x/0), not
        # an ANSI abort
        F.round(
            F.try_divide(F.col("m3"), F.pow(F.col("m2"), F.lit(1.5))), 6
        ).alias("skewness"),
        F.round(
            F.try_divide(F.col("m4"), F.col("m2") * F.col("m2")) - 3, 6
        ).alias("excess_kurtosis"),
    ).orderBy("event_type")


@register(
    "j_embedding_zscore",
    oracle="""
WITH src AS (
  SELECT vec_id, label, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
  WHERE embedding IS NOT NULL
),
dim_stats AS (
  -- 128-bit sums: q reaches 1e10 on unnormalized embeddings, so
  -- q*q (1e20) and corpus-scale sum(q) both overflow int64
  SELECT i,
    CAST(count(*) AS BIGINT) AS n,
    sum(CAST(q AS HUGEINT)) AS s1,
    sum(CAST(q AS HUGEINT) * q) AS s2
  FROM src GROUP BY i
),
z AS (
  SELECT s.vec_id, s.label,
    CAST(round(
      (CAST(s.q AS DOUBLE) - CAST(d.s1 AS DOUBLE) / d.n)
      / sqrt(CAST(d.s2 AS DOUBLE) / d.n
             - (CAST(d.s1 AS DOUBLE) / d.n) * (CAST(d.s1 AS DOUBLE) / d.n))
      * 1000, 0) AS BIGINT) AS z_milli
  FROM src s JOIN dim_stats d ON s.i = d.i
)
SELECT label,
  CAST(count(*) AS BIGINT) AS n_values,
  CAST(sum(z_milli) AS BIGINT) AS sum_z_milli,
  CAST(sum(abs(z_milli)) AS BIGINT) AS sum_abs_z_milli,
  CAST(max(abs(z_milli)) AS BIGINT) AS max_abs_z_milli
FROM z GROUP BY label ORDER BY label
""",
    tags=("J10", "D8", "H3"),
)
def j_embedding_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (z-scoring) of the embedding
    matrix — the whitening-lite step distance-based models need when
    dimensions carry unequal variance (j_embedding_dim_variance
    detects the problem; this fixes it). Per-dim μ/σ derive from
    EXACT integer sums; each z-value computes in one identical
    double sequence and is immediately quantized to integer
    milli-units, so every downstream aggregate (per-label checksums,
    max |z| — the clipping diagnostic) is bit-exact. The dim-stats
    table (64 rows) broadcasts back onto the exploded values.
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
    # 128-bit (DECIMAL(38,0)) sums: q reaches 1e10 on unnormalized
    # embeddings, so q*q (1e20) and corpus-scale Σq overflow int64
    # (extremes fixture; at 1e9 vectors Σq alone exceeds 2^63)
    dim_stats = src.groupBy("i").agg(
        F.count("*").alias("n"),
        F.sum(F.col("q").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.expr("CAST(q AS DECIMAL(38,0)) * q")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mu * mu
    # zero-variance dims z-score to NULL (try_divide, DuckDB x/0
    # semantics) instead of aborting under ANSI
    z = src.join(F.broadcast(dim_stats), "i").select(
        "label",
        F.round(
            F.try_divide(F.col("q").cast("double") - mu, F.sqrt(var)) * 1000,
            0,
        )
        .cast("long")
        .alias("z_milli"),
    )
    return (
        z.groupBy("label")
        .agg(
            F.count("*").alias("n_values"),
            F.sum("z_milli").alias("sum_z_milli"),
            F.sum(F.abs("z_milli")).alias("sum_abs_z_milli"),
            F.max(F.abs("z_milli")).alias("max_abs_z_milli"),
        )
        .orderBy("label")
    )
