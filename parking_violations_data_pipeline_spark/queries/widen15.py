"""Round-3 widening batch 16: Spark 4 Python-native extension points —
a custom batch DataSource written in Python (partition-planned,
engine-registered format) and a UDTF with a dynamic output schema via
the analyze() static method.

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, integer-exact payloads so the
oracle replays the custom source's formula verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "a_python_datasource",
    oracle="""
WITH days AS (
  SELECT unnest(generate_series(0, 364)) AS day
),
ccy AS (
  SELECT * FROM (VALUES ('CNY', 0), ('EUR', 1), ('GBP', 2), ('JPY', 3), ('USD', 4))
    AS t(ccy, i)
),
rates AS (
  SELECT c.ccy, d.day,
         1000000 + ((d.day * 31 + c.i * 9973) * 7919) % 250000 AS rate_micro
  FROM days d CROSS JOIN ccy c
)
SELECT ccy,
  CAST(count(*) AS BIGINT)        AS n_days,
  CAST(min(rate_micro) AS BIGINT) AS min_rate,
  CAST(max(rate_micro) AS BIGINT) AS max_rate,
  CAST(sum(rate_micro) AS BIGINT) AS sum_rate
FROM rates GROUP BY ccy ORDER BY ccy
""",
    tags=("A1", "A2", "K2"),
)
def a_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API end-to-end: register a custom
    format implemented purely in Python (sources/pyds.py), read it
    with `spark.read.format("synthetic_rates")`, aggregate. The
    reader plans 12 monthly InputPartitions, so the scan runs as 12
    parallel Python worker tasks — the same partition-count-is-
    parallelism contract as file sources, which is what makes a
    Python source viable at scale (each partition streams rows via
    Arrow, no driver funnel).

    The payload is integer-exact by design, so the oracle replays the
    generator formula in SQL and the driver hash must match bit for
    bit — proving the custom-source path loses nothing.
    """
    from parking_violations_data_pipeline_spark.sources.pyds import RatesDataSource

    from parking_violations_data_pipeline_spark.sources.pyds import (
        register_python_datasource,
    )

    register_python_datasource(spark, RatesDataSource)
    from parking_violations_data_pipeline_spark.sources.pyds import (
        load_python_datasource,
    )
    rates = (
        load_python_datasource(spark, "synthetic_rates", n_days="365")
    )
    return (
        rates.groupBy("ccy")
        .agg(
            F.count("*").alias("n_days"),
            F.min("rate_micro").alias("min_rate"),
            F.max("rate_micro").alias("max_rate"),
            F.sum("rate_micro").alias("sum_rate"),
        )
        .orderBy("ccy")
    )


@register(
    "k_udtf_analyze",
    oracle="""
WITH toks AS (
  SELECT list_filter(string_split(p_name, ' '), x -> x <> '') AS ws FROM part
),
cols AS (
  SELECT ws[1] AS c0, ws[2] AS c1, ws[3] AS c2 FROM toks
)
SELECT
  CAST(count(*) AS BIGINT)            AS n_rows,
  CAST(count(DISTINCT c0) AS BIGINT)  AS d0,
  CAST(count(DISTINCT c1) AS BIGINT)  AS d1,
  CAST(count(DISTINCT c2) AS BIGINT)  AS d2,
  min(c0)                             AS min_c0,
  max(c2)                             AS max_c2
FROM cols
""",
    tags=("K4",),
)
def k_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF with a DYNAMIC output schema: the static
    `analyze()` hook inspects the constant column-count argument at
    plan time and synthesizes the result schema (c0..c{k-1}) — the API
    that lets one table function serve any width (CSV shredding,
    key-value pivots) without per-width registrations. k_udtf covers
    the fixed-schema path; this is the planning-time metaprogramming
    path.

    The UDTF splits p_name into its first 3 words as 3 columns; the
    aggregate fingerprint (row count, per-column distincts, min/max)
    pins the shredding against the oracle's list-indexing twin.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitCols:
        @staticmethod
        def analyze(s: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            width = int(k.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"c{i}", StringType()) for i in range(width)]
                )
            )

        def eval(self, s: str, k: int):
            parts = [w for w in (s or "").split(" ") if w]
            yield tuple(
                (parts[i] if i < len(parts) else None) for i in range(k)
            )

    spark.udtf.register("split_cols", udtf(SplitCols))
    p = load_table(spark, sf_dir, "part")
    p.createOrReplaceTempView("__part_udtf")
    return spark.sql(
        """
SELECT
  CAST(count(*) AS BIGINT)           AS n_rows,
  CAST(count(DISTINCT c0) AS BIGINT) AS d0,
  CAST(count(DISTINCT c1) AS BIGINT) AS d1,
  CAST(count(DISTINCT c2) AS BIGINT) AS d2,
  min(c0)                            AS min_c0,
  max(c2)                            AS max_c2
FROM __part_udtf, LATERAL split_cols(p_name, 3) t
"""
    )
