"""Round-3 widening batch 65: reproducible per-epoch corpus
shuffling — the trainer-side ordering contract (different order every
epoch, bit-identical on re-run) proven via order checksums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_epoch_shuffle",
    oracle="""
WITH epochs AS (SELECT unnest(generate_series(0, 2)) AS epoch),
keyed AS (
  SELECT e.epoch, d.doc_id,
    md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)) AS k
  FROM documents d CROSS JOIN epochs e
),
ordered AS (
  SELECT epoch, doc_id,
    CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS BIGINT) AS pos
  FROM keyed
)
SELECT CAST(epoch AS BIGINT) AS epoch,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(pos * doc_id) % 1000000007 AS BIGINT) AS order_checksum,
  CAST(sum(CASE WHEN pos = doc_id + 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed_points
FROM ordered GROUP BY epoch ORDER BY epoch
""",
    tags=("J13", "H4", "F1"),
)
def t_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-epoch shuffling: each training epoch orders
    the corpus by md5(doc_id:epoch) — a different permutation every
    epoch (the regularization shuffling buys) that is SEEDLESSLY
    reproducible on any engine and any partitioning (the property
    checkpoint-resume needs: re-running epoch k replays its exact
    order). The per-epoch order checksum Σ pos·doc_id (mod p) pins
    the whole permutation in one number; the near-zero fixed-point
    counts show the orders genuinely differ from the natural one.
    Assigning positions is one rank per epoch over the hash key —
    at 100 TB the sort key doubles as the range-partition key, so
    the shuffle IS the write order.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(0, 3).select(F.col("id").cast("int").alias("epoch"))
    keyed = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("epoch").cast("string"))
        ).alias("k"),
    )
    w = Window.partitionBy("epoch").orderBy("k", "doc_id")
    ordered = keyed.select(
        "epoch", "doc_id", F.row_number().over(w).cast("long").alias("pos")
    )
    return (
        ordered.groupBy(F.col("epoch").cast("long").alias("epoch"))
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum(F.col("pos") * F.col("doc_id")) % 1000000007).alias("order_checksum"),
            F.sum(F.when(F.col("pos") == F.col("doc_id") + 1, 1).otherwise(0)).alias(
                "n_fixed_points"
            ),
        )
        .orderBy("epoch")
    )
