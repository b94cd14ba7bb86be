"""Round-4 widening batch 105: perceptual-hash near-duplicate
detection over binary payloads — the image-dedup pipeline shape
(decode → downscale → aHash → bucket) with the decode step
deterministic, per the multimodal stub convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import multimodal as MM
from parking_violations_data_pipeline_spark.registry import register


@register(
    "m_phash_neardup",
    oracle="""
WITH cells AS (
  -- UTF-8 BYTE grid via the hex dump (characterwise unicode() only
  -- matched the engine's byte path on pure ASCII)
  SELECT doc_id, ((i - 1) * 16) // (len(h) // 2) AS pos,
    16*(instr('0123456789ABCDEF', substring(h, 2*i-1, 1))-1)
      + (instr('0123456789ABCDEF', substring(h, 2*i, 1))-1) AS val
  FROM (SELECT doc_id, hex(encode(text)) AS h,
               unnest(range(1, octet_length(encode(text)) + 1)) AS i
        FROM documents WHERE octet_length(encode(text)) > 0)
),
pooled AS (
  SELECT doc_id, pos, sum(val) // count(*) AS cell
  FROM cells GROUP BY doc_id, pos
),
means AS (
  SELECT doc_id, sum(cell) // 16 AS mu FROM pooled GROUP BY doc_id
),
hashes AS (
  SELECT p.doc_id,
    CAST(sum(CASE WHEN p.cell >= m.mu THEN power(2, p.pos)::BIGINT
             ELSE 0 END) AS BIGINT) AS ahash
  FROM pooled p JOIN means m ON p.doc_id = m.doc_id
  GROUP BY p.doc_id
),
buckets AS (
  SELECT ahash, count(*) AS k FROM hashes GROUP BY ahash
)
SELECT
  CAST(sum(k) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_distinct_hashes,
  CAST(coalesce(sum(CASE WHEN k > 1 THEN k END), 0) AS BIGINT)
    AS n_candidate_dups,
  CAST(max(k) AS BIGINT) AS largest_bucket
FROM buckets
""",
    tags=("MM", "J6", "K2"),
)
def m_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection — the image-dedup
    pipeline end-to-end: binary payload → downscale to a 16-cell
    thumbnail (m_resize_pool's Arrow kernel) → average-hash (bit i set
    iff cell i ≥ the thumbnail's own mean — aHash, the classic pHash
    family member) → equal-hash bucketing, where same-bucket payloads
    are visual-dup candidates. The decode is the deterministic stub
    (bytes stand in for pixels — a real JPEG decode drops into
    attach_binary unchanged); everything downstream is exactly the
    production plumbing: integer pooling, integer mean, bit packing,
    one hash-key shuffle for the bucket census. The oracle re-derives
    every cell characterwise."""
    d = load_table(spark, sf_dir, "documents")
    pooled = MM.resize_pool(MM.attach_binary(d), buckets=16)
    means = pooled.groupBy("doc_id").agg(
        F.expr("sum(pooled) div 16").alias("mu")
    )
    hashes = (
        pooled.join(means, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("pooled") >= F.col("mu"),
                    F.expr("cast(pow(2, pos) as bigint)"),
                ).otherwise(0)
            ).alias("ahash")
        )
    )
    buckets = hashes.groupBy("ahash").agg(F.count("*").alias("k"))
    return buckets.agg(
        F.sum("k").alias("n_docs"),
        F.count("*").alias("n_distinct_hashes"),
        F.coalesce(
            F.sum(F.when(F.col("k") > 1, F.col("k"))), F.lit(0)
        ).alias("n_candidate_dups"),
        F.max("k").alias("largest_bucket"),
    )
