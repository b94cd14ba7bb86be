"""Round-3 widening batch 58: source-level vocabulary overlap matrix
(corpus composition diagnostics) and the empirical-rule σ-band check
(68-95-99.7 shares via cross-multiplied integers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_source_vocab_overlap",
    oracle="""
WITH toks AS (
  SELECT DISTINCT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE length(text) > 0
),
clean AS (SELECT source, tok FROM toks WHERE tok <> ''),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM clean GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS inter
  FROM clean a JOIN clean b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.src_a, i.src_b, i.inter,
  CAST(i.inter * 1000000 // (sa.sz + sb.sz - i.inter) AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes sa ON i.src_a = sa.source
JOIN sizes sb ON i.src_b = sb.source
ORDER BY jaccard_ppm DESC, src_a, src_b LIMIT 15
""",
    tags=("J2", "D1", "C1"),
)
def d_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level vocabulary overlap: Jaccard similarity of the
    token-type sets of every source pair — the corpus-composition
    matrix that flags near-duplicate sources (two crawls of one
    site) before doc-level dedup ever runs. The pair join runs over
    the (source, type) rollup — bounded by |vocab|·|sources|, never
    by documents — and exact Jaccard uses inclusion-exclusion on
    integer set sizes.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    clean = (
        d.select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    sizes = clean.groupBy("source").agg(F.count("*").alias("sz"))
    a = clean.alias("a")
    b = clean.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sza"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("szb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "inter",
            F.expr("inter * 1000000 div (sza + szb - inter)").alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "src_a", "src_b")
        .limit(15)
    )


@register(
    "d_sigma_bands",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_type IN ('purchase', 'click')
),
s AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS s1,
    CAST(sum(x * x) AS BIGINT) AS s2
  FROM v GROUP BY event_type
),
banded AS (
  SELECT v.event_type,
    CASE WHEN CAST(v.x * s.n - s.s1 AS DECIMAL(38, 0)) * (v.x * s.n - s.s1)
              <= CAST(1 AS DECIMAL(38, 0)) * (CAST(s.n AS DECIMAL(38, 0)) * s.s2 - CAST(s.s1 AS DECIMAL(38, 0)) * s.s1)
         THEN 1 ELSE 0 END AS in_1s,
    CASE WHEN CAST(v.x * s.n - s.s1 AS DECIMAL(38, 0)) * (v.x * s.n - s.s1)
              <= CAST(4 AS DECIMAL(38, 0)) * (CAST(s.n AS DECIMAL(38, 0)) * s.s2 - CAST(s.s1 AS DECIMAL(38, 0)) * s.s1)
         THEN 1 ELSE 0 END AS in_2s,
    CASE WHEN CAST(v.x * s.n - s.s1 AS DECIMAL(38, 0)) * (v.x * s.n - s.s1)
              <= CAST(9 AS DECIMAL(38, 0)) * (CAST(s.n AS DECIMAL(38, 0)) * s.s2 - CAST(s.s1 AS DECIMAL(38, 0)) * s.s1)
         THEN 1 ELSE 0 END AS in_3s
  FROM v JOIN s ON v.event_type = s.event_type
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(in_1s) * 1000000 // count(*) AS BIGINT) AS within_1s_ppm,
  CAST(sum(in_2s) * 1000000 // count(*) AS BIGINT) AS within_2s_ppm,
  CAST(sum(in_3s) * 1000000 // count(*) AS BIGINT) AS within_3s_ppm
FROM banded GROUP BY event_type ORDER BY event_type
""",
    tags=("D8", "B3"),
)
def d_sigma_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-rule profile: the share of values within 1σ/2σ/3σ of
    their group mean — the quickest normality sanity check (a
    Gaussian shows ≈68/95/99.7%; uniform data ≈58/100/100; this
    fixture's right-skewed purchase values show ≈81/95/99%). Band
    membership is the pure-integer cross-multiplication
    (x·n − S1)² ≤ k²·(n·S2 − S1²) — exactly |x−μ| ≤ k·σ with
    population σ² = (n·S2 − S1²)/n² — so no σ is ever materialized
    as a double and band edges can't flap; group sufficient
    statistics broadcast back onto the values.

    The squared/spread terms pass bigint range even at gate scale,
    so both sides evaluate them in DECIMAL(38,0)/HUGEINT — the
    q_returns_p_chart wide-integer precedent.
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
        F.sum(F.expr("x * x")).alias("s2"),
    )
    joined = v.join(F.broadcast(s), "event_type")
    dev2 = F.expr(
        "cast(x * n - s1 as decimal(38,0)) * (x * n - s1)"
    )
    # spread = n*S2 - S1^2 = n^2 * sigma^2 (population): the band test
    # (x*n - S1)^2 <= k^2 * (n*S2 - S1^2) is |x - mu| <= k*sigma exactly.
    # Round 5 fix: an extra *n factor here made the bands sqrt(n) too
    # wide, so every row tested "within 1 sigma" (1e6 ppm reported where
    # the true uniform-fixture share is ~58%) — a shared engine+oracle
    # bug caught by the independent-derivation sweep
    # (tests/test_indep_misc_r5.py).
    spread = F.expr(
        "cast(n as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1"
    )
    banded = joined.select(
        "event_type",
        F.when(dev2 <= F.lit(1).cast("decimal(38,0)") * spread, 1).otherwise(0).alias("in_1s"),
        F.when(dev2 <= F.lit(4).cast("decimal(38,0)") * spread, 1).otherwise(0).alias("in_2s"),
        F.when(dev2 <= F.lit(9).cast("decimal(38,0)") * spread, 1).otherwise(0).alias("in_3s"),
    )
    return (
        banded.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr("sum(in_1s) * 1000000 div count(*)").alias("within_1s_ppm"),
            F.expr("sum(in_2s) * 1000000 div count(*)").alias("within_2s_ppm"),
            F.expr("sum(in_3s) * 1000000 div count(*)").alias("within_3s_ppm"),
        )
        .orderBy("event_type")
    )
