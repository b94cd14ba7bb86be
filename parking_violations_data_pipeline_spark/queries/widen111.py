"""Round-4 widening batch 111: the partitioning-hint SQL surface
(REPARTITION / COALESCE hints — the layout knobs that live in the
query text, not the job code).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "b_partition_hints",
    oracle="""
SELECT o_orderpriority AS pri,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM orders GROUP BY pri ORDER BY pri
""",
    tags=("B1", "D1"),
)
def b_partition_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning hints in SQL text — /*+ REPARTITION(n, col) */
    forces a hash exchange on the named column before the aggregate
    (the pre-shuffle a pipeline author injects when the next stage
    needs co-location the optimizer can't see, e.g. a downstream
    partitioned write), and results must be IDENTICAL to the unhinted
    form — hints steer layout, never semantics, which is exactly what
    the oracle checks. The repartition count also pins the output
    file count when this frame is written (the small-files control).
    Plan shape (asserted in tests): RoundRobin/hash Exchange injected
    by hint, aggregate unchanged."""
    pid = os.getpid()
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView(f"orders_hint_{pid}")
    return spark.sql(
        f"""
        SELECT /*+ REPARTITION(8, o_orderpriority) */
          o_orderpriority AS pri,
          count(*) AS n,
          sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders_hint_{pid}
        GROUP BY pri ORDER BY pri
        """
    )
