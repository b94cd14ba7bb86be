"""Round-4 widening batch 83: MAU growth accounting (the
new/retained/resurrected/churned decomposition with its conservation
law) and CDC log compaction with tombstone semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_growth_accounting",
    oracle="""
WITH um AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS m FROM events
  WHERE ts IS NOT NULL
),
fx AS (
  SELECT user_id, m,
    min(m) OVER (PARTITION BY user_id) AS first_m,
    lag(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m
  FROM um
),
cls AS (
  SELECT m,
    CASE WHEN m = first_m THEN 'new'
         WHEN prev_m = m - INTERVAL 7 DAY THEN 'retained'
         ELSE 'resurrected' END AS klass
  FROM fx
),
mau AS (SELECT m, count(*) AS mau FROM um GROUP BY m),
dec AS (
  SELECT m,
    count(*) FILTER (WHERE klass = 'new') AS new_users,
    count(*) FILTER (WHERE klass = 'retained') AS retained,
    count(*) FILTER (WHERE klass = 'resurrected') AS resurrected
  FROM cls GROUP BY m
)
SELECT strftime(dec.m, '%Y-%m-%d') AS week,
  CAST(mau.mau AS BIGINT) AS mau,
  CAST(dec.new_users AS BIGINT) AS new_users,
  CAST(dec.retained AS BIGINT) AS retained,
  CAST(dec.resurrected AS BIGINT) AS resurrected,
  (dec.new_users + dec.retained + dec.resurrected = mau.mau) AS conserved
FROM dec JOIN mau ON dec.m = mau.m
ORDER BY week
""",
    tags=("E2", "D1"),
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAU growth accounting: every week's active users decomposed
    into new (first-ever week), retained (also active the prior week)
    and resurrected (returning after a gap) — the decomposition every
    growth team reports, with its conservation law
    new + retained + resurrected = WAU emitted as an in-plan boolean.
    One distinct (user, week) grid, then first-week and lag windows
    on a single user_id shuffle; the per-week rollup is tiny."""
    # activity weeks come from event time: NULL ts dropped both sides
    # (a NULL week also makes DuckDB's window sort order — and thus its
    # lag() — nondeterministic across runs; measured on the nullts
    # fixture: 'retained' flipped to 'resurrected' in ~1/4 runs)
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    um = e.select("user_id", F.date_trunc("week", "ts").alias("m")).distinct()
    w_user = Window.partitionBy("user_id")
    fx = um.select(
        "m",
        F.min("m").over(w_user).alias("first_m"),
        F.lag("m").over(w_user.orderBy("m")).alias("prev_m"),
    )
    cls = fx.select(
        "m",
        F.when(F.col("m") == F.col("first_m"), "new")
        .when(
            F.col("prev_m") == F.col("m") - F.expr("INTERVAL 7 DAY"), "retained"
        )
        .otherwise("resurrected")
        .alias("klass"),
    )
    dec = cls.groupBy("m").agg(
        F.count(F.when(F.col("klass") == "new", 1)).alias("new_users"),
        F.count(F.when(F.col("klass") == "retained", 1)).alias("retained"),
        F.count(F.when(F.col("klass") == "resurrected", 1)).alias("resurrected"),
    )
    mau = um.groupBy("m").agg(F.count("*").alias("mau"))
    return (
        dec.join(mau, "m")
        .select(
            F.date_format("m", "yyyy-MM-dd").alias("week"),
            "mau",
            "new_users",
            "retained",
            "resurrected",
            (
                F.col("new_users") + F.col("retained") + F.col("resurrected")
                == F.col("mau")
            ).alias("conserved"),
        )
        .orderBy("week")
    )


@register(
    "etl_log_compaction",
    oracle="""
WITH log AS (
  SELECT event_id, user_id AS key, epoch_us(ts) AS us,
    CASE WHEN event_type = 'view' THEN 'D' ELSE 'U' END AS op,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
latest AS (
  SELECT key, op, cents,
    row_number() OVER (PARTITION BY key ORDER BY us DESC, event_id DESC) AS rn
  FROM log
)
SELECT
  CAST(count(*) AS BIGINT) AS n_keys_seen,
  CAST(count(*) FILTER (WHERE op = 'U') AS BIGINT) AS n_live,
  CAST(count(*) FILTER (WHERE op = 'D') AS BIGINT) AS n_tombstoned,
  CAST(coalesce(sum(cents) FILTER (WHERE op = 'U'), 0) AS BIGINT)
    AS live_cents
FROM latest WHERE rn = 1
""",
    tags=("G3", "E2"),
)
def etl_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction with tombstones — the Kafka-compacted-topic /
    CDC-merge semantic: replay a change log (upserts + deletes per
    key), keep only each key's LATEST operation, and drop keys whose
    latest op is a delete (the tombstone actually removes the row —
    the semantics plain keep-latest dedup doesn't have). Events stand
    in for the log: 'view' rows are deletes, everything else upserts;
    latest-wins is full-key deterministic ((ts, event_id) DESC). One
    window on the key shuffle; at scale this is exactly the
    merge-on-read compaction pass a lakehouse table service runs."""
    e = load_table(spark, sf_dir, "events")
    log = e.select(
        "event_id",
        F.col("user_id").alias("key"),
        F.col("ts"),
        F.when(F.col("event_type") == "view", "D").otherwise("U").alias("op"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("key").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = log.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return latest.agg(
        F.count("*").alias("n_keys_seen"),
        F.count(F.when(F.col("op") == "U", 1)).alias("n_live"),
        F.count(F.when(F.col("op") == "D", 1)).alias("n_tombstoned"),
        F.coalesce(
            F.sum(F.when(F.col("op") == "U", F.col("cents"))), F.lit(0)
        ).alias("live_cents"),
    )
