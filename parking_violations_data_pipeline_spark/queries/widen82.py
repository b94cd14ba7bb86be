"""Round-4 widening batch 82: watermarked stream-stream LEFT OUTER
join — null-emission-on-watermark, the hardest streaming join
semantic, proven equal to the batch outer join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.registry import register
from parking_violations_data_pipeline_spark.streaming import jobs


@register(
    "s_stream_stream_outer",
    oracle="""
WITH c AS (
  SELECT event_id AS c_id, user_id AS c_user, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    AND ts > TIMESTAMP '1970-01-01 00:00:00'  -- admission contract
),
p AS (
  SELECT user_id AS p_user, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    AND ts > TIMESTAMP '1970-01-01 00:00:00'  -- admission contract
),
j AS (
  SELECT c.c_id, p.p_us
  FROM c LEFT JOIN p ON c.c_user = p.p_user
    AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 1800000000
)
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(p_us) AS BIGINT) AS n_matched,
  CAST(count(*) FILTER (WHERE p_us IS NULL) AS BIGINT) AS n_unmatched
FROM j
""",
    tags=("I9", "I7", "C2"),
)
def s_stream_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join under watermarks: every click
    joined to purchases within its 30-minute window, and clicks with
    NO qualifying purchase emitted with nulls — but only after the
    watermark passes their window (the state-eviction proof). The
    drained sink must equal the batch LEFT JOIN bit-for-bit: matched
    pair count AND unmatched count — the unmatched side only appears
    if watermark advancement + eviction actually work (see
    jobs.stream_stream_outer_unmatched for the flush-sentinel batch
    choreography that makes the final eviction observable in replay)."""
    pairs = jobs.stream_stream_outer_unmatched(spark, sf_dir)
    real = pairs.filter(F.col("c_user") >= 0)
    return real.agg(
        F.count("*").alias("n_rows"),
        F.count("p_ts").alias("n_matched"),
        F.count(F.when(F.col("p_ts").isNull(), 1)).alias("n_unmatched"),
    )
