"""Streaming inventory as oracle pairs (SURVEY.md §2 I).

Each entry drains the events stream with availableNow into a memory
sink (streaming/jobs.py) and the oracle recomputes the same result in
batch SQL — the batch-equivalence protocol. Windows align because
Spark tumbling/sliding windows are epoch-aligned, exactly like
floor(epoch/width) arithmetic in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register
from parking_violations_data_pipeline_spark.streaming import jobs


@register(
    "s_tumbling_window",
    oracle="""
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
  event_type, count(*) AS cnt, round(sum(value), 2) AS sv
FROM events WHERE ts IS NOT NULL
GROUP BY h, event_type ORDER BY h, event_type
""",
    tags=("I1", "I2", "A6"),
)
def s_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I2: streamed watermarked 1-hour tumbling windows == batch
    date_trunc (no late data in replay)."""
    return jobs.tumbling_counts(spark, sf_dir).orderBy("h", "event_type")


@register(
    "s_sliding_window",
    oracle="""
SELECT CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 - k.range * 900 AS BIGINT)) AS TIMESTAMP) AS ws,
  event_type, count(*) AS cnt
FROM events CROSS JOIN range(0, 4) k
WHERE ts IS NOT NULL
GROUP BY ws, event_type ORDER BY ws, event_type
""",
    tags=("I3", "A6"),
)
def s_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I3: 1h/15min sliding windows — every event in 4 windows; oracle
    derives the same windows with floor-epoch arithmetic."""
    return jobs.sliding_counts(spark, sf_dir).orderBy("ws", "event_type")


@register(
    "s_sliding_topk",
    oracle="""
SELECT ws, event_type, cnt FROM (
  SELECT ws, event_type, cnt,
         row_number() OVER (PARTITION BY ws ORDER BY cnt DESC, event_type) AS rn
  FROM (
    SELECT CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900
                                  - k.range * 900 AS BIGINT)) AS TIMESTAMP) AS ws,
      event_type, count(*) AS cnt
    FROM events CROSS JOIN range(0, 4) k
    WHERE ts IS NOT NULL
    GROUP BY ws, event_type
  )
) WHERE rn <= 2 ORDER BY ws, cnt DESC, event_type
""",
    tags=("I3", "E4", "A6"),
)
def s_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items: top-2 event types per 1h/15min sliding window.
    The streaming stage produces the windowed counts (same job as
    s_sliding_window — ranking can't run inside an un-finalized
    stream); the rank is the standard batch post-pass over the sink,
    exactly how a production trending job is layered. Deterministic
    top-k: cnt DESC with the event_type tie-break.
    """
    from pyspark.sql.window import Window

    counts = jobs.sliding_counts(spark, sf_dir)
    w = Window.partitionBy("ws").orderBy(F.desc("cnt"), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("ws", "event_type", "cnt")
        .orderBy("ws", F.desc("cnt"), "event_type")
    )


@register(
    "s_session_window",
    oracle="""
WITH g AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk
  -- admission contract: stateful event-time ops admit only
  -- post-epoch times (jobs.admissible_event_time)
  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        WHERE ts IS NOT NULL AND ts > TIMESTAMP '1970-01-01 00:00:00')
),
s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
SELECT user_id, min(ts) AS st, max(ts) + INTERVAL 30 MINUTE AS en, count(*) AS n
FROM s GROUP BY user_id, sid ORDER BY user_id, st
""",
    tags=("I4", "A6"),
)
def s_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I4: native streaming session windows (30-min gap); a session's
    end is last_event + gap, which the batch oracle reproduces from
    gaps-and-islands."""
    return jobs.session_windows(spark, sf_dir).orderBy("user_id", "st")


@register(
    "s_dedup_watermark",
    oracle="""
WITH d AS (
  -- keyed dedup like dropDuplicatesWithinWatermark: one survivor per
  -- event_id. Arrival order in the fixtures is ascending value for a
  -- duplicated id, so the min-(value, event_type) copy is the
  -- first-seen one; NULL event times never enter watermarked state.
  SELECT event_id, event_type, value,
    row_number() OVER (PARTITION BY event_id
                       ORDER BY value, event_type) AS rn
  FROM events
  WHERE ts IS NOT NULL AND ts > TIMESTAMP '1970-01-01 00:00:00'
)
SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sv
FROM d WHERE rn = 1 GROUP BY event_type ORDER BY event_type
""",
    tags=("I5", "A6", "G3"),
)
def s_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I5: at-least-once delivery (stream unioned with itself) fixed by
    dropDuplicatesWithinWatermark — the aggregate equals the batch
    answer over the ORIGINAL events, proving every duplicate died."""
    return jobs.dedup_within_watermark(spark, sf_dir).orderBy("event_type")


@register(
    "s_stream_static_join",
    oracle="""
WITH w(event_type, weight) AS (VALUES ('click', 1.0), ('view', 0.5),
       ('purchase', 5.0), ('signup', 3.0), ('error', 0.0))
SELECT e.event_type, count(*) AS cnt, round(sum(e.value * w.weight), 4) AS weighted
FROM events e JOIN w USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
""",
    tags=("I7", "A6", "C3"),
)
def s_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7: stream ⋈ static broadcast dimension + weighted aggregate."""
    return jobs.stream_static_join(spark, sf_dir).orderBy("event_type")


@register(
    "s_stream_stream_join",
    oracle="""
SELECT c.user_id,
       count(*) AS n_pairs,
       CAST(min(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS min_lag_us,
       round(sum(p.value), 2) AS attributed
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 -- admission contract: post-epoch event times only (mirrors the
 -- engine's pre-stateful admissible_event_time filter)
 AND c.ts > TIMESTAMP '1970-01-01 00:00:00'
 AND p.ts > TIMESTAMP '1970-01-01 00:00:00'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id ORDER BY c.user_id
""",
    tags=("I9", "I7", "I1", "C7", "A6"),
)
def s_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7+: watermarked stream-stream inner join (click→purchase
    attribution within 30 min), per-user pair counts, min lag in exact
    µs (unix_micros/epoch_us both sides — the sub-second trap), and
    attributed revenue."""
    pairs = jobs.stream_stream_attribution(spark, sf_dir)
    return (
        pairs.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.min(
                epoch_us("p_ts") - epoch_us("c_ts")
            ).alias("min_lag_us"),
            F.round(F.sum("p_value"), 2).alias("attributed"),
        )
        .orderBy("user_id")
    )


@register(
    "s_stateful_user_stats",
    oracle="""
SELECT user_id, count(*) AS n, round(sum(value), 2) AS total, max(value) AS mx
FROM events GROUP BY user_id ORDER BY user_id
""",
    tags=("I6", "A6", "K3"),
)
def s_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6: custom stateful operator (applyInPandasWithState) keeping
    running per-user stats; final emitted state == batch aggregate."""
    return jobs.stateful_user_stats(spark, sf_dir).orderBy("user_id")


@register(
    "s_foreach_batch",
    oracle="""
SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS sv
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("A6", "I8"),
)
def s_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: foreachBatch sink — per-micro-batch custom batch logic;
    folding the per-batch partials equals the batch aggregate however
    the stream was chunked."""
    out = jobs.foreach_batch_upsert(spark, sf_dir)
    return (
        out.groupBy("event_type")
        .agg(F.sum("cnt").alias("cnt"), F.round(F.sum("sv"), 2).alias("sv"))
        .orderBy("event_type")
    )
