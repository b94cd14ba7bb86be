"""Round-3 widening batch 57: sessionization gap-sensitivity (three
gap thresholds in ONE window pass) and the deletion-neighborhood
(FastSS) edit-distance-1 join — the blocking trick that makes fuzzy
self-joins linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_session_gap_sensitivity",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
  WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id,
    CASE WHEN us - lag(us) OVER w > 900000000
         OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS b15,
    CASE WHEN us - lag(us) OVER w > 1800000000
         OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS b30,
    CASE WHEN us - lag(us) OVER w > 3600000000
         OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS b60
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT
  CAST(sum(b15) AS BIGINT) AS sessions_15m,
  CAST(sum(b30) AS BIGINT) AS sessions_30m,
  CAST(sum(b60) AS BIGINT) AS sessions_60m,
  CAST(count(*) AS BIGINT) AS n_events
FROM flagged
""",
    tags=("I4", "E2", "D1"),
)
def q_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization sensitivity: total session counts at 15/30/60
    minute gap thresholds — the calibration table analysts need
    before committing to a session definition (a knee in this curve
    IS the natural gap). All three thresholds evaluate on ONE lag
    over ONE user shuffle (session count = Σ break flags; the prefix
    sums that assign ids are unnecessary for counting) — three
    parameters for the price of one pass, the q_scenario_sweep
    discipline applied to a window operator.
    """
    # session gaps are event-time gaps: NULL ts dropped both sides
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", epoch_us("ts").alias("us"), "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)

    def brk(us_gap):
        return F.when(gap.isNull() | (gap > us_gap), 1).otherwise(0)

    flagged = e.select(
        brk(900000000).alias("b15"),
        brk(1800000000).alias("b30"),
        brk(3600000000).alias("b60"),
    )
    return flagged.agg(
        F.sum("b15").alias("sessions_15m"),
        F.sum("b30").alias("sessions_30m"),
        F.sum("b60").alias("sessions_60m"),
        F.count("*").alias("n_events"),
    )


@register(
    "h_edit1_neighborhood_join",
    oracle="""
WITH names AS (
  SELECT DISTINCT c_name AS nm FROM customer
),
variants AS (
  SELECT nm, nm AS v FROM names
  UNION ALL
  SELECT nm, substr(nm, 1, i - 1) || substr(nm, i + 1) AS v
  FROM names, unnest(generate_series(1, length(nm))) AS t(i)
),
cand AS (
  SELECT DISTINCT a.nm AS nm_a, b.nm AS nm_b
  FROM variants a JOIN variants b ON a.v = b.v AND a.nm < b.nm
),
verified AS (
  SELECT nm_a, nm_b FROM cand WHERE levenshtein(nm_a, nm_b) <= 1
)
SELECT
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT nm_a) AS BIGINT) AS n_left_names,
  CAST(min(levenshtein(nm_a, nm_b)) AS BIGINT) AS min_dist,
  CAST(max(levenshtein(nm_a, nm_b)) AS BIGINT) AS max_dist
FROM verified
""",
    tags=("H1", "C1", "J6"),
)
def h_edit1_neighborhood_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 self-join via DELETION NEIGHBORHOODS (FastSS):
    every name generates its |name|+1 single-deletion variants; two
    names within edit distance 1 MUST share a variant, so candidate
    pairs come from an equi-join on variant strings — O(n·len)
    blocking instead of the O(n²) all-pairs levenshtein (the
    ID-like fixture names make near-miss pairs abundant: ids
    differing in one digit collide on the common deletion). The
    cheap exact levenshtein verify runs only on candidates. This is
    the technique that scales typo-matching to 100 TB; counts and
    distance bounds are exact on both engines.
    """
    c = load_table(spark, sf_dir, "customer")
    names = c.select(F.col("c_name").alias("nm")).distinct()
    dels = names.select(
        "nm",
        F.explode(
            F.expr(
                "concat(array(nm), transform(sequence(1, length(nm)),"
                " i -> concat(substring(nm, 1, i - 1), substring(nm, i + 1, length(nm)))))"
            )
        ).alias("v"),
    )
    a = dels.alias("a")
    b = dels.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.nm") < F.col("b.nm")))
        .select(F.col("a.nm").alias("nm_a"), F.col("b.nm").alias("nm_b"))
        .distinct()
    )
    verified = cand.filter(F.levenshtein("nm_a", "nm_b") <= 1)
    return verified.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("nm_a").alias("n_left_names"),
        F.min(F.levenshtein("nm_a", "nm_b")).cast("long").alias("min_dist"),
        F.max(F.levenshtein("nm_a", "nm_b")).cast("long").alias("max_dist"),
    )
