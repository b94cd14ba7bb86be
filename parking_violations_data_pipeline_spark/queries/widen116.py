"""Round-4 widening batch 116: consistent hash-threshold sampling —
the sample that STAYS a sample as the corpus grows (the property
Bernoulli/seeded sampling lacks), with the stability proof in-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_consistent_sample",
    oracle="""
WITH hashed AS (
  SELECT doc_id, n_chars,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
      AS u
  FROM documents
),
full_sample AS (SELECT * FROM hashed WHERE u < 100000),
half_corpus AS (SELECT * FROM hashed WHERE doc_id % 2 = 0),
half_sample AS (SELECT * FROM half_corpus WHERE u < 100000)
SELECT
  CAST((SELECT count(*) FROM full_sample) AS BIGINT) AS n_sampled,
  CAST((SELECT sum(n_chars) FROM full_sample) AS BIGINT) AS sampled_chars,
  CAST((SELECT count(*) FROM half_sample) AS BIGINT) AS n_half_sampled,
  ((SELECT count(*) FROM half_sample)
   = (SELECT count(*) FROM full_sample WHERE doc_id % 2 = 0))
    AS subset_stable
""",
    tags=("F4", "H4"),
)
def t_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent sampling: a document is in the ~10% sample iff
    md5(doc_id) maps below a fixed threshold — membership depends ONLY
    on the row itself, so the sample of any subset equals the subset
    of the sample (proven in-plan: sampling half the corpus yields
    exactly the full sample's rows restricted to that half). That
    stability is what makes eval sets, debugging slices and A/B
    holdouts survive corpus growth — a seeded Bernoulli draw
    re-randomizes on every change in row order or count. Same
    md5-to-int bridge as t_fim_split; zero shuffle beyond the final
    count."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        "n_chars",
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
            " as bigint) % 1000000"
        ).alias("u"),
    )
    full_sample = hashed.filter(F.col("u") < 100000)
    half_sample = hashed.filter((F.col("doc_id") % 2 == 0) & (F.col("u") < 100000))
    full_on_half = full_sample.filter(F.col("doc_id") % 2 == 0)
    return (
        full_sample.agg(
            F.count("*").alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .crossJoin(half_sample.agg(F.count("*").alias("n_half_sampled")))
        .crossJoin(full_on_half.agg(F.count("*").alias("n_check")))
        .select(
            "n_sampled",
            "sampled_chars",
            "n_half_sampled",
            (F.col("n_half_sampled") == F.col("n_check")).alias(
                "subset_stable"
            ),
        )
    )
