"""Round-3 widening batch 63: cross-lingual contamination (identical
normalized content appearing under different language tags) and the
column-level change profile between dimension snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_crosslang_dupes",
    oracle="""
WITH fp AS (
  SELECT DISTINCT lang, md5(lower(trim(text))) AS h
  FROM documents WHERE length(text) > 0
),
pairs AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM fp a JOIN fp b ON a.h = b.h AND a.lang < b.lang
  GROUP BY a.lang, b.lang
)
SELECT lang_a, lang_b, n_shared
FROM pairs ORDER BY n_shared DESC, lang_a, lang_b
""",
    tags=("J5", "J2", "C1"),
)
def t_crosslang_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual contamination: byte-identical normalized content
    filed under DIFFERENT language tags — in a multilingual corpus
    this is either mislabeled language metadata or untranslated
    copy-through, and both poison language-balanced sampling
    (t_temperature_mix would over-draw the duplicated content). The
    check is a fingerprint equi-join across language partitions at
    (lang, hash) grain — linear, and the md5 fingerprint is the
    engine-shared hash.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    fp = d.select(
        "lang", F.md5(F.lower(F.trim("text"))).alias("h")
    ).distinct()
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.lang") < F.col("b.lang")))
        .groupBy(F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"))
        .agg(F.count("*").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "lang_a", "lang_b")
    )


@register(
    "etl_column_change_profile",
    oracle="""
WITH v2 AS (
  SELECT c_custkey,
    CASE WHEN c_custkey % 7 = 0 THEN 'MOVED-SEGMENT' ELSE c_mktsegment END AS seg,
    CASE WHEN c_custkey % 11 = 0
         THEN CAST(round(c_acctbal * 100, 0) AS BIGINT) + 500
         ELSE CAST(round(c_acctbal * 100, 0) AS BIGINT) END AS cents,
    c_nationkey
  FROM customer
),
diffs AS (
  SELECT
    CASE WHEN c.c_mktsegment <> v.seg THEN 1 ELSE 0 END AS seg_chg,
    CASE WHEN CAST(round(c.c_acctbal * 100, 0) AS BIGINT) <> v.cents THEN 1 ELSE 0 END AS bal_chg,
    CASE WHEN c.c_nationkey <> v.c_nationkey THEN 1 ELSE 0 END AS nat_chg
  FROM customer c JOIN v2 v ON c.c_custkey = v.c_custkey
)
SELECT col_name, n_changed, n_rows,
  CAST(n_changed * 1000000 // n_rows AS BIGINT) AS changed_ppm
FROM (
  SELECT 'c_acctbal' AS col_name, CAST(sum(bal_chg) AS BIGINT) AS n_changed,
    CAST(count(*) AS BIGINT) AS n_rows FROM diffs
  UNION ALL
  SELECT 'c_mktsegment', CAST(sum(seg_chg) AS BIGINT), CAST(count(*) AS BIGINT) FROM diffs
  UNION ALL
  SELECT 'c_nationkey', CAST(sum(nat_chg) AS BIGINT), CAST(count(*) AS BIGINT) FROM diffs
)
ORDER BY col_name
""",
    tags=("B5", "L", "D1"),
)
def etl_column_change_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level change profile between dimension snapshots: for
    each column, how many matched rows changed — the drill-down
    below etl_snapshot_diff's row-level classify (a spike in ONE
    column's change rate localizes the upstream bug; a row-level
    'changed' count can't). The v2 snapshot derives
    deterministically (every 7th segment re-labeled, every 11th
    balance shifted 5 dollars); per-column deltas come from one
    keyed join + conditional sums, stacked into the long-format
    profile reporting dashboards expect.
    """
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    v2 = c.select(
        F.col("c_custkey").alias("vk"),
        F.when(F.col("c_custkey") % 7 == 0, "MOVED-SEGMENT")
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.when(F.col("c_custkey") % 11 == 0, cents + 500).otherwise(cents).alias("vcents"),
        F.col("c_nationkey").alias("vnat"),
    )
    diffs = c.join(v2, c.c_custkey == v2.vk).select(
        F.when(F.col("c_mktsegment") != F.col("seg"), 1).otherwise(0).alias("seg_chg"),
        F.when(cents != F.col("vcents"), 1).otherwise(0).alias("bal_chg"),
        F.when(F.col("c_nationkey") != F.col("vnat"), 1).otherwise(0).alias("nat_chg"),
    )
    agg = diffs.agg(
        F.sum("seg_chg").alias("seg"),
        F.sum("bal_chg").alias("bal"),
        F.sum("nat_chg").alias("nat"),
        F.count("*").alias("n"),
    ).collect()[0]
    rows = [
        ("c_acctbal", agg["bal"], agg["n"]),
        ("c_mktsegment", agg["seg"], agg["n"]),
        ("c_nationkey", agg["nat"], agg["n"]),
    ]
    return (
        local_df(spark, rows, "col_name string, n_changed long, n_rows long")
        .withColumn("changed_ppm", F.expr("n_changed * 1000000 div n_rows"))
        .orderBy("col_name")
    )
