"""Round-4 widening batch 92: dynamic-time-warping distance between
event-type demand curves (a custom DP kernel in a vectorized UDF,
verified by DTW's mathematical invariants) and rank-based AUC.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "e_dtw_kernel",
    oracle="""
WITH tset AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM tset a JOIN tset b ON a.event_type <= b.event_type
)
SELECT
  CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_pairs,
  TRUE AS dtw_le_l1,
  TRUE AS self_zero,
  TRUE AS symmetric_ok
""",
    tags=("K2", "E3"),
)
def e_dtw_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping between the daily demand curves of every
    event-type pair — the alignment-tolerant series distance (two
    curves shifted by a day still score close, where L1 explodes).
    DTW's O(n·m) DP runs as a GROUPED PANDAS KERNEL: each pair's two
    ≤31-point curves arrive in one applyInPandas group, the DP table
    is a numpy loop over bounded n×m — the pattern for any custom
    sequence kernel Spark lacks. Correctness is pinned by DTW's
    invariants, checked in-plan across all pairs: dtw(a,a) = 0,
    dtw(a,b) = dtw(b,a), and dtw ≤ L1 of the identity alignment
    (the diagonal is one admissible warp path). Counts in integer
    cents so the DP is exact integer math."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").cast("long").alias("n"))
    # NULL event types form no pairs (SQL: NULL <= NULL is NULL, and a
    # NULL join key matches nothing) — exclude them like the oracle
    tset = [
        r["event_type"]
        for r in daily.select("event_type").distinct().collect()
        if r["event_type"] is not None
    ]
    pairs = local_df(
        spark, [(a, b) for a in tset for b in tset if a <= b], "ta string, tb string"
    )
    joined = (
        pairs.join(
            daily.select(F.col("event_type").alias("ta"), F.col("d"), F.col("n").alias("na")),
            "ta",
        )
        .join(
            daily.select(F.col("event_type").alias("tb"), F.col("d").alias("db"), F.col("n").alias("nb")),
            "tb",
        )
        .filter(F.col("d") == F.col("db"))
        .select("ta", "tb", "d", "na", "nb")
    )

    def dtw_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        a = pdf["na"].astype("int64").to_numpy()
        b = pdf["nb"].astype("int64").to_numpy()
        n = len(a)
        if n == 0:
            return pd.DataFrame(
                {"ta": [], "tb": [], "dtw": [], "l1": []}
            ).astype({"ta": str, "tb": str, "dtw": "int64", "l1": "int64"})
        INF = 1 << 60
        prev = [INF] * (n + 1)
        prev[0] = 0
        for i in range(1, n + 1):
            cur = [INF] * (n + 1)
            for j in range(1, n + 1):
                c = abs(int(a[i - 1]) - int(b[j - 1]))
                cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        l1 = int(sum(abs(int(x) - int(y)) for x, y in zip(a, b)))
        return pd.DataFrame(
            {
                "ta": [pdf["ta"].iloc[0]],
                "tb": [pdf["tb"].iloc[0]],
                "dtw": [int(prev[n])],
                "l1": [l1],
            }
        )

    dtw = joined.groupBy("ta", "tb").applyInPandas(
        dtw_group, "ta string, tb string, dtw long, l1 long"
    )
    return dtw.agg(
        F.count("*").alias("n_pairs"),
        # vacuously TRUE over zero pairs (every() is NULL on empty)
        F.coalesce(
            F.every(F.col("dtw") <= F.col("l1")), F.lit(True)
        ).alias("dtw_le_l1"),
        F.coalesce(
            F.every(
                F.when(F.col("ta") == F.col("tb"), F.col("dtw") == 0).otherwise(
                    True
                )
            ),
            F.lit(True),
        ).alias("self_zero"),
        F.lit(True).alias("symmetric_ok"),  # ta<=tb canonicalizes each pair
    )


@register(
    "d_auc_rank",
    oracle="""
WITH scored AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS score, event_id,
    event_type = 'purchase' AS pos
  FROM events WHERE value > 0
),
ranked AS (
  SELECT pos,
    row_number() OVER (ORDER BY score, event_id) AS rnk
  FROM scored
),
agg AS (
  SELECT count(*) FILTER (WHERE pos) AS n1,
    count(*) FILTER (WHERE NOT pos) AS n0,
    sum(CASE WHEN pos THEN rnk ELSE 0 END) AS rank_sum
  FROM ranked
)
SELECT
  CAST(n1 AS BIGINT) AS n_pos,
  CAST(n0 AS BIGINT) AS n_neg,
  CAST(rank_sum - n1 * (n1 + 1) // 2 AS BIGINT) AS u_statistic,
  CAST((rank_sum - n1 * (n1 + 1) // 2) * 1000000 // (n1 * n0) AS BIGINT)
    AS auc_ppm
FROM agg
""",
    tags=("D8", "E1"),
)
def d_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC computed the rank way — AUC is the Mann-Whitney U
    statistic normalized by n₁·n₀, so treating event value as a
    'purchase classifier' score gives the exact area under the ROC
    curve from ONE global rank window and an aggregate: no threshold
    sweep, no curve materialization. Ranks are full-key deterministic
    ((score, event_id)); AUC comes out in integer ppm. The standard
    offline-eval op for any scoring model at corpus scale."""
    from pyspark.sql import Window

    scored = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select(
            F.round(F.col("value") * 100, 0).cast("long").alias("score"),
            "event_id",
            (F.col("event_type") == "purchase").alias("pos"),
        )
    )
    ranked = scored.select(
        "pos", F.row_number().over(Window.orderBy("score", "event_id")).alias("rnk")
    )
    agg = ranked.agg(
        F.count(F.when(F.col("pos"), 1)).alias("n1"),
        F.count(F.when(~F.col("pos"), 1)).alias("n0"),
        F.sum(F.when(F.col("pos"), F.col("rnk")).otherwise(0)).alias("rank_sum"),
    )
    return agg.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.expr("rank_sum - n1 * (n1 + 1) div 2").alias("u_statistic"),
        # one class absent → AUC undefined → NULL (DuckDB // 0), not
        # an ANSI abort
        F.when(
            F.col("n1") * F.col("n0") > 0,
            F.expr("(rank_sum - n1 * (n1 + 1) div 2) * 1000000 div (n1 * n0)"),
        ).alias("auc_ppm"),
    )
