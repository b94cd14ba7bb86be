"""Round-4 widening batch 117: the SQL three-valued-logic truth table
— AND/OR/NOT over {TRUE, FALSE, NULL} pinned value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "b_three_valued_logic",
    oracle="""
WITH vals(i, v) AS (VALUES (0, TRUE), (1, FALSE), (2, NULL)),
grid AS (
  SELECT a.i AS ai, b.i AS bi, a.v AS x, b.v AS y
  FROM vals a CROSS JOIN vals b
)
SELECT ai, bi,
  coalesce(CAST(x AND y AS VARCHAR), 'NULL') AS and_r,
  coalesce(CAST(x OR y AS VARCHAR), 'NULL') AS or_r,
  coalesce(CAST(NOT x AS VARCHAR), 'NULL') AS not_x,
  CAST(x IS NOT DISTINCT FROM y AS VARCHAR) AS nullsafe_eq
FROM grid ORDER BY ai, bi
""",
    tags=("B5", "B6"),
)
def b_three_valued_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL three-valued-logic truth table, pinned cell by cell:
    AND/OR/NOT over every pair from {TRUE, FALSE, NULL}, plus the
    null-safe equality that collapses 3VL back to 2VL. This is the
    semantics every filter in the engine stands on (NULL AND FALSE =
    FALSE but NULL AND TRUE = NULL — the asymmetry that silently
    drops rows when a predicate meets a null); pinning the full grid
    against the oracle guarantees both engines agree on all nine
    cells. Results serialize NULL as the string 'NULL' so the
    comparator sees values, not missing cells."""
    # local_df (round-11): the pyrdd form of this 3-row frame made the
    # 3x3 crossJoin a 32x32-task CartesianProduct — 38 s of scheduling
    # for 9 rows; Arrow-backed single-partition frame -> one task
    vals = local_df(
        spark, [(0, True), (1, False), (2, None)], "i int, v boolean"
    )
    a = vals.select(F.col("i").alias("ai"), F.col("v").alias("x"))
    b = vals.select(F.col("i").alias("bi"), F.col("v").alias("y"))
    grid = a.crossJoin(b)

    def show(c):
        return F.coalesce(c.cast("string"), F.lit("NULL"))

    return grid.select(
        "ai",
        "bi",
        show(F.col("x") & F.col("y")).alias("and_r"),
        show(F.col("x") | F.col("y")).alias("or_r"),
        show(~F.col("x")).alias("not_x"),
        F.col("x").eqNullSafe(F.col("y")).cast("string").alias("nullsafe_eq"),
    ).orderBy("ai", "bi")
