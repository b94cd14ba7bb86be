"""Round-3 widening batch 59: batch-MERGE idempotency (apply-twice ==
apply-once, the batch twin of s_exactly_once_replay) and an intrinsic
dimension estimate for the embedding corpus (two-NN MLE with
order-free integer accumulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


def _merge(target: DataFrame, source: DataFrame) -> DataFrame:
    """Last-write-wins MERGE: full outer on the key, source wins."""
    t = target.select(F.col("k").alias("tk"), F.col("cents").alias("tc"))
    s = source.select(F.col("k").alias("sk"), F.col("cents").alias("sc"))
    return t.join(s, t.tk == s.sk, "full_outer").select(
        F.coalesce("tk", "sk").alias("k"),
        F.coalesce("sc", "tc").alias("cents"),
    )


@register(
    "etl_merge_idempotency",
    oracle="""
WITH target AS (
  SELECT o_custkey AS k,
    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey
),
source AS (
  SELECT o_custkey AS k,
    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) * 2 AS cents
  FROM orders WHERE o_custkey % 3 = 0 GROUP BY o_custkey
),
merged AS (
  SELECT coalesce(t.k, s.k) AS k, coalesce(s.cents, t.cents) AS cents
  FROM target t FULL OUTER JOIN source s ON t.k = s.k
)
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(cents) AS BIGINT) AS total_cents,
  CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
  TRUE AS idempotent
FROM merged
""",
    tags=("C2", "L", "G1"),
)
def etl_merge_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE idempotency, proven by applying the SAME source batch
    TWICE: merge(merge(target, src), src) must equal
    merge(target, src) row-for-row (last-write-wins is idempotent by
    design — a re-delivered batch or a retried job must not change
    the table). The batch twin of s_exactly_once_replay's streaming
    guarantee. `idempotent` compares the two results via an exact
    anti-join count IN-PLAN; the summary row re-derives from the
    single application so the oracle checks both the merge algebra
    and the idempotency claim.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    target = (
        o.filter(F.col("o_custkey") % 2 == 0)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum(cents).alias("cents"))
    )
    source = (
        o.filter(F.col("o_custkey") % 3 == 0)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg((F.sum(cents) * 2).alias("cents"))
    )
    once = _merge(target, source)
    twice = _merge(once, source)
    diff = (
        once.withColumnRenamed("cents", "c1")
        .join(twice.withColumnRenamed("cents", "c2"), "k", "full_outer")
        # IS DISTINCT FROM: a legitimately-NULL cents value that
        # round-trips as NULL is NOT a difference
        .filter(~F.col("c1").eqNullSafe(F.col("c2")))
        .count()
    )
    return once.agg(
        F.count("*").alias("n_rows"),
        F.sum("cents").alias("total_cents"),
        F.countDistinct("k").alias("n_keys"),
    ).withColumn("idempotent", F.lit(bool(diff == 0)))


@register(
    "j_intrinsic_dimension",
    oracle="""
WITH src AS MATERIALIZED (
  SELECT vec_id, i,
    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS q
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
  WHERE embedding IS NOT NULL AND vec_id < 200
),
d2 AS (
  -- 128-bit per-term square: |a.q - b.q| reaches 1e10 on
  -- unnormalized embeddings, so the square overflows int64
  SELECT a.vec_id AS va, b.vec_id AS vb,
    CAST(sum(CAST(a.q - b.q AS HUGEINT) * (a.q - b.q) // 1000000) AS BIGINT) AS dist2
  FROM src a JOIN src b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
sym AS (
  SELECT va AS v, vb AS o, dist2 FROM d2
  UNION ALL
  SELECT vb, va, dist2 FROM d2
),
ranked AS (
  SELECT v, dist2,
    row_number() OVER (PARTITION BY v ORDER BY dist2, o) AS rn
  FROM sym
),
pairs AS (
  SELECT v,
    max(CASE WHEN rn = 1 THEN dist2 END) AS r1,
    max(CASE WHEN rn = 2 THEN dist2 END) AS r2
  FROM ranked GROUP BY v
),
terms AS (
  SELECT CAST(round(ln(CAST(r2 AS DOUBLE) / r1) * 1000000 / 2, 0) AS BIGINT) AS mu_micro
  FROM pairs WHERE r1 > 0
)
SELECT
  CAST(count(*) AS BIGINT) AS n_points,
  CAST(sum(mu_micro) AS BIGINT) AS sum_mu_micro,
  CAST(count(*) * 1000000 // greatest(sum(mu_micro), 1) AS BIGINT) AS id_estimate,
  CAST(count(*) * 1000000000 // greatest(sum(mu_micro), 1) AS BIGINT) AS id_milli
FROM terms
""",
    tags=("J10", "D8"),
)
def j_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intrinsic dimension of the embedding manifold by the two-NN
    MLE (Facco et al.): per point, μ = ln(r₂/r₁)/2 over its two
    nearest neighbors; ID ≈ n/Σμ — the diagnostic that says how much
    of the 64 ambient dimensions the data actually uses (drives
    index choice and compression targets). Per-point μ quantizes to
    integer micro-units immediately (each ln runs once on an
    exactly-agreed rational of integer squared distances), so the
    accumulation is order-free integer addition — the d_pmi_cells
    rounding discipline. The exact 2-NN scan is documented
    bounded-n (200 points) ground truth, the same contract as
    j_sim_self_join's exact twin; the scale path substitutes the
    LSH/IVF neighbor candidates already registered.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    src = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("i0", "x")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("q"),
    )
    a = src.alias("a")
    b = src.alias("b")
    d2 = (
        a.join(b, (F.col("a.i") == F.col("b.i")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .groupBy(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
        # 128-bit per-term square (extremes fixture: q spans ±1e10)
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(a.q - b.q AS DECIMAL(38,0)) * (a.q - b.q)"
                    " div 1000000 AS LONG)"
                )
            ).alias("dist2")
        )
    )
    sym = d2.select(F.col("va").alias("v"), F.col("vb").alias("o"), "dist2").unionByName(
        d2.select(F.col("vb").alias("v"), F.col("va").alias("o"), "dist2")
    )
    w = Window.partitionBy("v").orderBy("dist2", "o")
    ranked = sym.select("v", "dist2", F.row_number().over(w).alias("rn"))
    pairs = ranked.groupBy("v").agg(
        F.max(F.when(F.col("rn") == 1, F.col("dist2"))).alias("r1"),
        F.max(F.when(F.col("rn") == 2, F.col("dist2"))).alias("r2"),
    )
    terms = pairs.filter(F.col("r1") > 0).select(
        F.round(
            F.log(F.col("r2").cast("double") / F.col("r1")) * 1000000 / 2, 0
        )
        .cast("long")
        .alias("mu_micro")
    )
    # ID = n/Σμ = n·1e6/Σμ_micro directly: the earlier divide-the-divisor
    # form (÷(Σμ_micro div 1e6)) truncated a ~5.5 divisor to 5 and
    # reported 40 for a true 36.3 — caught by the round-5 independent-
    # derivation sweep (tests/test_indep_ml_r5.py). Numerator n·1e9 is
    # bounded (n ≤ 200 documented), so no overflow concern.
    return terms.agg(
        F.count("*").alias("n_points"),
        F.sum("mu_micro").alias("sum_mu_micro"),
        F.expr("count(*) * 1000000 div greatest(sum(mu_micro), 1)").alias(
            "id_estimate"
        ),
        F.expr("count(*) * 1000000000 div greatest(sum(mu_micro), 1)").alias(
            "id_milli"
        ),
    )
