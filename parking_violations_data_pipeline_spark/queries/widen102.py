"""Round-4 widening batch 102: Poisson bootstrap — the resampling
scheme that works on distributed data (no global index needed), made
bit-deterministic with md5-derived draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register

# Poisson(1) inverse-CDF thresholds out of 1e6 (cumulative e^-1 * 1/k!):
# u < 367879 → 0, < 735759 → 1, < 919699 → 2, < 981012 → 3,
# < 996340 → 4, < 999406 → 5, < 999917 → 6, < 999990 → 7, else 8
_POIS = [(367879, 0), (735759, 1), (919699, 2), (981012, 3),
         (996340, 4), (999406, 5), (999917, 6), (999990, 7)]


def _pois_case(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for t, k in _POIS
    )
    return f"CASE {branches} ELSE 8 END"


@register(
    "d_poisson_bootstrap_ci",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
    sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY d
),
reps AS (
  SELECT b, d, cents,
    {_pois_case("('0x' || substr(md5(CAST(d AS VARCHAR) || '-' || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 1000000")}
      AS w
  FROM daily CROSS JOIN (SELECT unnest(range(0, 16)) AS b)
),
totals AS (
  SELECT b, sum(w * cents) AS total FROM reps GROUP BY b
)
SELECT
  CAST(16 AS BIGINT) AS n_replicates,
  CAST((SELECT sum(cents) FROM daily) AS BIGINT) AS observed_total,
  CAST(min(total) AS BIGINT) AS boot_min,
  CAST(max(total) AS BIGINT) AS boot_max,
  CAST(sum(total) // 16 AS BIGINT) AS boot_mean,
  (min(total) <= (SELECT sum(cents) FROM daily)
   AND (SELECT sum(cents) FROM daily) <= max(total)) AS observed_in_range
FROM totals
""",
    tags=("D5", "D8"),
)
def d_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap over daily purchase revenue — the resampling
    scheme that actually works on distributed data: instead of drawing
    n rows WITH replacement (which needs a global index and a shuffle
    per replicate), every row independently receives a Poisson(1)
    weight per replicate, and all 16 replicates compute in ONE pass
    over a 16× row fan-out. Determinism: the 'random' draw is the md5
    of (day, replicate) mapped through the exact Poisson(1) inverse
    CDF in integer millionths — same weights in any engine, any run.
    Emits the bootstrap range of the revenue total and whether the
    observed total falls inside it (it essentially always does — the
    check that the weighting is centered)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    reps = daily.crossJoin(
        spark.range(16).select(F.col("id").cast("int").alias("b"))
    ).select(
        "b",
        "cents",
        F.expr(
            _pois_case(
                "cast(conv(substr(md5(concat(cast(d as string), '-',"
                " cast(b as string))), 1, 8), 16, 10) as bigint) % 1000000"
            )
        ).alias("w"),
    )
    totals = reps.groupBy("b").agg(F.sum(F.col("w") * F.col("cents")).alias("total"))
    observed = daily.agg(F.sum("cents").alias("obs"))
    return totals.crossJoin(observed).agg(
        F.lit(16).cast("long").alias("n_replicates"),
        F.max("obs").alias("observed_total"),
        F.min("total").alias("boot_min"),
        F.max("total").alias("boot_max"),
        F.expr("sum(total) div 16").alias("boot_mean"),
        (
            (F.min("total") <= F.max("obs")) & (F.max("obs") <= F.max("total"))
        ).alias("observed_in_range"),
    )
