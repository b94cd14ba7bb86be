"""Round-3 widening batch 14: Welch's unequal-variance t-test (the
missing member of the drift-stats family), PII masking via the
engine's `mask` function with pattern profiling, and an IVF-ANN
recall-vs-nprobe curve with in-plan monotonicity invariants.

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles derived from exact integer
components through identical expressions (then rounded on both
sides), total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_ttest_welch",
    oracle="""
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS early
  FROM events WHERE event_type = 'purchase'
),
g AS (
  SELECT early,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(cents) AS BIGINT) AS s1,
    CAST(sum(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS ss
  FROM s GROUP BY early
),
stats AS (
  SELECT
    max(CASE WHEN early = 1 THEN n END)  AS n1,
    max(CASE WHEN early = 0 THEN n END)  AS n2,
    max(CASE WHEN early = 1 THEN s1 END) AS t1,
    max(CASE WHEN early = 0 THEN s1 END) AS t2,
    max(CASE WHEN early = 1 THEN ss END) AS ss1,
    max(CASE WHEN early = 0 THEN ss END) AS ss2
  FROM g
),
derived AS (
  SELECT n1, n2,
    t1 * 1.0 / n1 AS m1, t2 * 1.0 / n2 AS m2,
    (ss1 - (t1 * 1.0 / n1) * t1) / (n1 - 1) AS v1,
    (ss2 - (t2 * 1.0 / n2) * t2) / (n2 - 1) AS v2
  FROM stats
)
SELECT
  CAST(n1 AS BIGINT) AS n_early,
  CAST(n2 AS BIGINT) AS n_late,
  round(m1 - m2, 4) AS mean_diff_cents,
  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
  round(
    (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
    / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)),
    2
  ) AS df_welch
FROM derived
""",
    tags=("D8", "D1"),
)
def d_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on purchase value, first half
    of month vs second — completes the drift-stats family (KS, PSI,
    Mann-Whitney, chi², two-proportion z) with the mean-shift test
    that does NOT assume equal variances (the pooled-variance t is the
    classic misuse when sample sizes differ).

    Everything reduces to the five exact sufficient statistics (n,
    Σx, Σx² per group — cents as integers, Σx² in HUGEINT/decimal),
    so both engines derive t and the Welch–Satterthwaite df from
    bit-identical inputs through the identical expression. One shuffle
    to a 2-row group table; the test itself is scalar algebra.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    s = e.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("early"),
    )
    g = s.groupBy("early").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s1"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")
        )
        .cast("double")
        .alias("ss"),
    )
    stats = g.agg(
        F.max(F.when(F.col("early") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("early") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("early") == 1, F.col("s1"))).alias("t1"),
        F.max(F.when(F.col("early") == 0, F.col("s1"))).alias("t2"),
        F.max(F.when(F.col("early") == 1, F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("early") == 0, F.col("ss"))).alias("ss2"),
    )
    m1 = F.col("t1") * 1.0 / F.col("n1")
    m2 = F.col("t2") * 1.0 / F.col("n2")
    v1 = (F.col("ss1") - m1 * F.col("t1")) / (F.col("n1") - 1)
    v2 = (F.col("ss2") - m2 * F.col("t2")) / (F.col("n2") - 1)
    se2_1 = v1 / F.col("n1")
    se2_2 = v2 / F.col("n2")
    return stats.select(
        F.col("n1").alias("n_early"),
        F.col("n2").alias("n_late"),
        F.round(m1 - m2, 4).alias("mean_diff_cents"),
        F.round((m1 - m2) / F.sqrt(se2_1 + se2_2), 4).alias("t_stat"),
        F.round(
            (se2_1 + se2_2) * (se2_1 + se2_2)
            / (
                se2_1 * se2_1 / (F.col("n1") - 1)
                + se2_2 * se2_2 / (F.col("n2") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


@register(
    "h_mask_funcs",
    oracle=r"""
WITH raw AS (
  SELECT 'customer' AS src, c_name AS s FROM customer
  UNION ALL
  SELECT 'part' AS src, p_name AS s FROM part
),
masked AS (
  -- Unicode categories (\p{Lu}/\p{Ll}/\p{Nd}), not ASCII classes:
  -- Spark's mask() classifies by Character.isUpper/Lower/Digit, which
  -- covers the full Unicode range
  SELECT src, regexp_replace(
           regexp_replace(
             regexp_replace(s, '\p{Lu}', 'X', 'g'),
             '\p{Ll}', 'x', 'g'),
           '\p{Nd}', 'n', 'g') AS pattern
  FROM raw
)
SELECT src, pattern, CAST(count(*) AS BIGINT) AS n
FROM masked GROUP BY src, pattern ORDER BY n DESC, src, pattern LIMIT 15
""",
    tags=("H1", "H4"),
)
def h_mask_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking with the engine's `mask` function (upper→X,
    lower→x, digit→n, punctuation preserved) plus the standard
    follow-up: profile the masked PATTERNS. Pattern profiling over
    masked data is how a pipeline audits free-text columns for
    structure (and for unmasked leakage — an unexpected pattern is a
    finding) without ever shipping the raw values.

    Spark's `mask()` is a single JVM expression; the oracle reproduces
    it with three regexp passes. Pattern cardinality is tiny by
    construction, so the count shuffle is bounded by pattern space,
    not rows.
    """
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_name").alias("s")
    )
    p = load_table(spark, sf_dir, "part").select(
        F.lit("part").alias("src"), F.col("p_name").alias("s")
    )
    return (
        c.unionByName(p)
        .select("src", F.mask(F.col("s")).alias("pattern"))
        .groupBy("src", "pattern")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("src"), F.col("pattern"))
        .limit(15)
    )


@register(
    "j_ivf_recall_curve",
    oracle="""
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), CAST(10 AS BIGINT), TRUE),
  (CAST(2 AS BIGINT), CAST(10 AS BIGINT), TRUE),
  (CAST(4 AS BIGINT), CAST(10 AS BIGINT), TRUE)
) AS t(n_probe, k, recall_monotone)
ORDER BY n_probe
""",
    tags=("J8",),
)
def j_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN recall-vs-n_probe curve — the tuning table an ANN
    deployment reads to pick its scan fraction. For n_probe in
    {1, 2, 4}: run IVF against the exact top-10 and verify IN-PLAN
    that recall never decreases as n_probe grows (probing more
    clusters scans a superset of candidates, so the hit set can only
    grow — a structural invariant the query MEASURES rather than
    assumes). The oracle reproduces the invariant row shape; recall
    magnitudes are approximate-class and live in the repo's own
    semantics tests (j_ivf_knn measures the floor).

    Cost shape: one ivf_build (k-means on DataFrame ops), then three
    probe-limited scans; at corpus scale each probe scans ~n_probe/16
    of the data — the whole point of the curve.
    """
    from parking_violations_data_pipeline_spark.operators import similarity as S

    e = load_table(spark, sf_dir, "embeddings")
    row = e.filter(F.col("vec_id") == 0).select("embedding").head()
    qv = (
        [float(x) for x in row["embedding"]]
        if row and row["embedding"] is not None
        else [0.0] * 64
    )
    exact = S.knn_bruteforce(e, qv, 10).select("vec_id")
    # ONE quantizer for all three probes (round-11): ivf_build is
    # deterministic, so the per-probe rebuilds trained identical
    # centroids three times over — the docstring's cost shape ("one
    # ivf_build, then three probe-limited scans") now matches the code.
    # Sharing the build also makes the superset/monotonicity invariant
    # structural rather than relying on rebuild determinism.
    # return_vec: the vector-carrying assignments let each of the three
    # probes scan-filter the index instead of shuffle-joining the
    # corpus back onto it (round 12, guide §2.4)
    idx = S.ivf_build(e, k=16, return_vec=True)
    hits = {}
    for np_ in (1, 2, 4):
        ann = S.ivf_knn(
            e, qv, k=10, n_clusters=16, n_probe=np_, prebuilt=idx
        ).select("vec_id", F.lit(1).alias("hit"))
        hits[np_] = (
            exact.join(ann, "vec_id", "left")
            .agg(F.count("hit").alias("n_hit"))
            .withColumn("n_probe", F.lit(np_).cast("long"))
        )
    curve = hits[1].unionByName(hits[2]).unionByName(hits[4])
    from pyspark.sql import Window as W

    w = W.orderBy("n_probe").rowsBetween(W.unboundedPreceding, -1)
    return (
        curve.select(
            "n_probe",
            F.lit(10).cast("long").alias("k"),
            (
                F.col("n_hit")
                >= F.coalesce(F.max("n_hit").over(w), F.lit(0))
            ).alias("recall_monotone"),
        )
        .orderBy("n_probe")
    )
