"""Round-4 widening batch 85: the medallion (bronze→silver→gold)
pipeline with per-layer reconciliation, and the regexp_count/instr
function surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "etl_medallion",
    oracle="""
WITH bronze AS (
  SELECT *, try_cast(props AS JSON) IS NOT NULL AS props_ok FROM events
),
silver AS (
  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM bronze
  WHERE props_ok AND value >= 0 AND user_id IS NOT NULL
),
gold AS (
  SELECT event_type, count(*) AS n, sum(cents) AS cents
  FROM silver GROUP BY event_type
)
SELECT
  CAST((SELECT count(*) FROM bronze) AS BIGINT) AS bronze_rows,
  CAST((SELECT count(*) FROM bronze WHERE NOT (props_ok AND value >= 0
        AND user_id IS NOT NULL)) AS BIGINT) AS quarantined,
  CAST((SELECT count(*) FROM silver) AS BIGINT) AS silver_rows,
  CAST((SELECT count(*) FROM gold) AS BIGINT) AS gold_groups,
  CAST((SELECT sum(n) FROM gold) AS BIGINT) AS gold_total_rows,
  ((SELECT count(*) FROM silver) +
   (SELECT count(*) FROM bronze WHERE NOT (props_ok AND value >= 0
        AND user_id IS NOT NULL))
   = (SELECT count(*) FROM bronze)) AS bronze_conserved,
  ((SELECT sum(n) FROM gold) = (SELECT count(*) FROM silver))
    AS gold_conserved
""",
    tags=("L", "A5"),
)
def etl_medallion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The medallion architecture in one auditable pass: bronze = raw
    events with a validity verdict (parseable props JSON, non-negative
    value, present key), silver = the conformed typed layer (exact-µs
    time, integer cents) containing only valid rows, gold = the
    business aggregate. Two conservation laws are emitted in-plan —
    silver + quarantine = bronze, and gold's row total = silver — the
    checks that make a layered lakehouse trustworthy rather than
    aspirational. Each layer derives from the previous one's frame
    (one scan; the bronze validity verdict is computed once and
    reused, not recomputed per layer)."""
    bronze = load_table(spark, sf_dir, "events").withColumn(
        "props_ok", F.try_parse_json(F.col("props")).isNotNull()
    )
    valid = (
        F.col("props_ok")
        & (F.col("value") >= 0)
        & F.col("user_id").isNotNull()
    )
    silver = bronze.filter(valid).select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    gold = silver.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("cents").alias("cents")
    )
    b = bronze.agg(
        F.count("*").alias("bronze_rows"),
        F.count(F.when(~valid, 1)).alias("quarantined"),
    )
    s = silver.agg(F.count("*").alias("silver_rows"))
    g = gold.agg(
        F.count("*").alias("gold_groups"),
        F.sum("n").alias("gold_total_rows"),
    )
    return (
        b.crossJoin(s)
        .crossJoin(g)
        .select(
            "bronze_rows",
            "quarantined",
            "silver_rows",
            "gold_groups",
            "gold_total_rows",
            (
                F.col("silver_rows") + F.col("quarantined")
                == F.col("bronze_rows")
            ).alias("bronze_conserved"),
            (F.col("gold_total_rows") == F.col("silver_rows")).alias(
                "gold_conserved"
            ),
        )
    )


@register(
    "h_regexp_count_instr",
    oracle="""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
  CAST(len(regexp_extract_all(lower(text), '\\bthe\\b')) AS BIGINT)
    AS n_the,
  CAST(CASE WHEN text IS NULL THEN NULL
       WHEN regexp_matches(text, '[0-9]')
       THEN length(regexp_extract(text, '^([^0-9]*)', 1)) + 1
       ELSE 0 END AS BIGINT) AS first_digit_pos
FROM documents WHERE doc_id < 50 ORDER BY doc_id
""",
    tags=("H1",),
)
def h_regexp_count_instr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_count / regexp_instr — the occurrence-census regex
    surface beyond extraction: how many number literals and how many
    'the' tokens each document holds, and where the first digit sits
    (1-based; 0 = none). The oracle's engine has no regexp_instr, so
    position is cross-checked structurally: length of the non-digit
    prefix + 1 — a different formulation that must agree exactly,
    which is the point of the parity check. All three are codegen'd
    JVM regex ops on the Spark side."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(r"[0-9]+")).cast("long").alias(
                "n_numbers"
            ),
            F.regexp_count(F.lower(F.col("text")), F.lit(r"\bthe\b"))
            .cast("long")
            .alias("n_the"),
            F.regexp_instr(F.col("text"), F.lit(r"[0-9]")).cast("long").alias(
                "first_digit_pos"
            ),
        )
        .orderBy("doc_id")
    )
