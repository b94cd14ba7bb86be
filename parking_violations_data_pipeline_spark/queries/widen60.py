"""Round-3 widening batch 61: lexical long-tail profile (hapax
legomena — the token-frequency tail that sizes vocabularies) and
peak concurrency via the +1/−1 sweep (maximum interval overlap,
the depth complement to e_interval_union_coverage's length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_hapax_profile",
    oracle="""
WITH toks AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS tok
  FROM documents WHERE length(text) > 0
),
freqs AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS f
  FROM toks WHERE tok <> '' GROUP BY source, tok
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_types,
  CAST(sum(f) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
  CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,
  CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
    AS hapax_ppm
FROM freqs GROUP BY source ORDER BY source
""",
    tags=("J1", "J2", "D1"),
)
def t_hapax_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical long-tail profile per source: hapax legomena (types
    seen once) and dis legomena (twice) — the frequency tail that
    decides tokenizer vocabulary sizes and Good-Turing smoothing
    mass (P(unseen) ≈ hapax/tokens), and a corpus-health tell (a
    machine-generated source shows an unnaturally thin tail). One
    (source, type) frequency rollup; all counts exact.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    freqs = (
        d.select("source", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("f"))
    )
    return (
        freqs.groupBy("source")
        .agg(
            F.count("*").alias("n_types"),
            F.sum("f").alias("n_tokens"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("n_hapax"),
            F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).alias("n_dis"),
            F.expr(
                "sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000000 div count(*)"
            ).alias("hapax_ppm"),
        )
        .orderBy("source")
    )


@register(
    "e_peak_concurrency",
    oracle="""
WITH iv AS (
  SELECT epoch_us(ts) // 86400000000 AS d,
    epoch_us(ts) AS s,
    least(epoch_us(ts) + 60000000,
          (epoch_us(ts) // 86400000000 + 1) * 86400000000) AS e,
    event_id
  FROM events
),
marks AS (
  SELECT d, s AS t, 1 AS delta, 0 AS tie, event_id FROM iv
  UNION ALL
  SELECT d, e AS t, -1 AS delta, 1 AS tie, event_id FROM iv
),
swept AS (
  SELECT d,
    sum(delta) OVER (PARTITION BY d ORDER BY t, tie, delta, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
  FROM marks
),
per_day AS (
  SELECT d, CAST(max(depth) AS BIGINT) AS peak FROM swept GROUP BY d
)
SELECT
  CAST(count(*) AS BIGINT) AS n_days,
  CAST(max(peak) AS BIGINT) AS max_peak,
  CAST(sum(peak) AS BIGINT) AS sum_daily_peaks
FROM per_day
""",
    tags=("E3", "I4", "D1"),
)
def e_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by the classic +1/−1 sweep: every activity
    interval (60 s per event, day-clipped) contributes an entry and
    an exit mark; the running sum of marks in time order is the
    instantaneous depth, and its maximum is the capacity answer
    ('how many sessions were live at the worst moment') —
    the DEPTH complement to e_interval_union_coverage's LENGTH.
    Tie discipline: at equal timestamps entries sort before exits
    (tie flag), so a touching end/start counts as overlapping on
    both engines; the sweep partitions by day (no global sort).
    """
    e = load_table(spark, sf_dir, "events")
    iv = e.select(epoch_us("ts").alias("s"), "event_id").select(
        F.expr("s div 86400000000").alias("d"),
        "s",
        F.expr("least(s + 60000000, (s div 86400000000 + 1) * 86400000000)").alias("e"),
        "event_id",
    )
    marks = iv.select(
        "d", F.col("s").alias("t"), F.lit(1).alias("delta"), F.lit(0).alias("tie"), "event_id"
    ).unionByName(
        iv.select(
            "d", F.col("e").alias("t"), F.lit(-1).alias("delta"), F.lit(1).alias("tie"), "event_id"
        )
    )
    w = (
        Window.partitionBy("d")
        .orderBy("t", "tie", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = marks.select("d", F.sum("delta").over(w).alias("depth"))
    per_day = swept.groupBy("d").agg(F.max("depth").alias("peak"))
    return per_day.agg(
        F.count("*").alias("n_days"),
        F.max("peak").alias("max_peak"),
        F.sum("peak").alias("sum_daily_peaks"),
    )
