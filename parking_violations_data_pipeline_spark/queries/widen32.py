"""Round-3 widening batch 33: catalog/DDL surface (CTAS, INSERT INTO,
spark.table, catalog introspection, DROP) and interval-union coverage
(the sessions-as-intervals sweep with day-clipped scale discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table, register_views
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "a_sql_ddl_catalog",
    oracle="""
WITH base AS (
  SELECT o_orderpriority,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
both_halves AS (
  SELECT * FROM base WHERE cents % 2 = 0
  UNION ALL
  SELECT * FROM base WHERE cents % 2 = 1
)
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(cents) AS BIGINT) AS cents,
  TRUE AS catalog_ok
FROM both_halves GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("A5", "A1", "B1"),
)
def a_sql_ddl_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/DDL surface end-to-end: CREATE TABLE AS SELECT (the
    even-cent half), INSERT INTO (the odd-cent half), then reading
    back through `spark.table` — the managed-table lifecycle every
    warehouse job uses instead of raw paths. catalog_ok additionally
    proves the introspection surface: the table is visible in
    spark.catalog.listTables and its column set matches before DROP
    TABLE cleans up. The oracle rebuilds both halves from the source,
    so the CTAS+INSERT union must be exactly row-complete (no
    double-insert, no missed half).
    """
    import os as _os

    tbl = f"ddl_ledger_{_os.getpid()}"  # per-process: warehouse dir is shared
    register_views(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"""
CREATE TABLE {tbl} USING parquet AS
SELECT o_orderpriority, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
FROM orders WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) % 2 = 0
"""
    )
    spark.sql(
        f"""
INSERT INTO {tbl}
SELECT o_orderpriority, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
FROM orders WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) % 2 = 1
"""
    )
    tables = [t.name for t in spark.catalog.listTables()]
    cols = [c.name for c in spark.catalog.listColumns(tbl)]
    catalog_ok = (tbl in tables) and (cols == ["o_orderpriority", "cents"])
    out = (
        spark.table(tbl)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"), F.sum("cents").alias("cents"))
        .withColumn("catalog_ok", F.lit(bool(catalog_ok)))
        .orderBy("o_orderpriority")
    )
    rows = out.collect()  # materialize before dropping the table
    spark.sql(f"DROP TABLE {tbl}")
    return local_df(spark, rows, out.schema)


@register(
    "e_interval_union_coverage",
    oracle="""
WITH iv AS (
  SELECT epoch_us(ts) // 86400000000 AS d,
    epoch_us(ts) AS s,
    least(epoch_us(ts) + 60000000,
          (epoch_us(ts) // 86400000000 + 1) * 86400000000) AS e,
    event_id
  FROM events
),
flagged AS (
  SELECT d, s, e, event_id,
    max(e) OVER (PARTITION BY d ORDER BY s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e
  FROM iv
),
islands AS (
  SELECT d, s, e,
    sum(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END)
      OVER (PARTITION BY d ORDER BY s, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
per_island AS (
  SELECT d, island, CAST(max(e) - min(s) AS BIGINT) AS len_us
  FROM islands GROUP BY d, island
)
SELECT
  CAST(count(DISTINCT d) AS BIGINT) AS n_days,
  CAST(count(*) AS BIGINT) AS n_islands,
  CAST(sum(len_us) // 1000000 AS BIGINT) AS covered_s,
  CAST(max(len_us) // 1000000 AS BIGINT) AS longest_island_s
FROM per_island
""",
    tags=("E3", "I4", "D1"),
)
def e_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: every event projects a 60-second
    activity interval; the metric is the total UNION length (overlap
    counted once) — the uptime/SLA-coverage sweep-line, which is
    sessionization generalized to explicit intervals. Scale
    discipline: intervals are CLIPPED at day boundaries and the
    sweep (running max(end) → island flags → prefix sums) runs
    PARTITIONED BY DAY, so no global single-partition sort exists at
    any scale — the day-boundary seam costs at most one merged
    island per day, identically on both engines. All µs-integer.
    """
    e = load_table(spark, sf_dir, "events")
    iv = e.select(epoch_us("ts").alias("s"), "event_id").select(
        F.expr("s div 86400000000").alias("d"),
        "s",
        F.expr("least(s + 60000000, (s div 86400000000 + 1) * 86400000000)").alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("d").orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "d", "s", "e", "event_id", F.max("e").over(w_prev).alias("prev_max_e")
    )
    w_cum = (
        Window.partitionBy("d").orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "d",
        "s",
        "e",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
            ).otherwise(0)
        )
        .over(w_cum)
        .alias("island"),
    )
    per_island = islands.groupBy("d", "island").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return per_island.agg(
        F.countDistinct("d").alias("n_days"),
        F.count("*").alias("n_islands"),
        F.expr("sum(len_us) div 1000000").alias("covered_s"),
        F.expr("max(len_us) div 1000000").alias("longest_island_s"),
    )
