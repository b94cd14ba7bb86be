"""Round-3 widening batch 37: incremental corpus dedup (new batch vs
existing corpus), bitemporal as-of lookup (valid-time × known-time),
the ANALYZE TABLE statistics surface, and SMA crossover signals with
cross-multiplied integer comparisons.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table, register_views
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "t_incremental_dedup",
    oracle="""
WITH split AS (
  SELECT doc_id, source, lower(text) AS t,
    CASE WHEN doc_id < (SELECT (max(doc_id) * 4) // 5 FROM documents)
         THEN 'existing' ELSE 'incoming' END AS corpus
  FROM documents WHERE length(text) > 0
),
grams AS (
  SELECT DISTINCT doc_id, corpus, source,
    unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]
            FOR i IN generate_series(1, len(ws) - 4)]) AS g
  FROM (SELECT doc_id, corpus, source, string_split(t, ' ') AS ws FROM split)
),
pruned AS (
  SELECT * FROM grams WHERE g IN (
    SELECT g FROM grams GROUP BY g HAVING count(*) <= 20)
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM pruned GROUP BY doc_id),
cand AS (
  SELECT i.doc_id AS new_id, e.doc_id AS old_id, CAST(count(*) AS BIGINT) AS inter
  FROM pruned i JOIN pruned e ON i.g = e.g
  WHERE i.corpus = 'incoming' AND e.corpus = 'existing'
  GROUP BY i.doc_id, e.doc_id
),
dup AS (
  SELECT DISTINCT c.new_id
  FROM cand c JOIN sizes a ON c.new_id = a.doc_id JOIN sizes b ON c.old_id = b.doc_id
  WHERE c.inter * 2 >= a.sz + b.sz - c.inter
)
SELECT s.source,
  CAST(count(*) AS BIGINT) AS n_incoming,
  CAST(sum(CASE WHEN d.new_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
  CAST(sum(CASE WHEN d.new_id IS NOT NULL THEN 1 ELSE 0 END)
       * 1000000 // count(*) AS BIGINT) AS dup_ppm
FROM split s LEFT JOIN dup d ON s.doc_id = d.new_id
WHERE s.corpus = 'incoming'
GROUP BY s.source ORDER BY s.source
""",
    tags=("J6", "J5", "C4"),
)
def t_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the shape production corpora actually run
    (a NEW batch screened against the EXISTING corpus, keep-old
    policy) rather than corpus-wide dedup from scratch: the last 20%
    of doc_ids are 'incoming', candidates come from shared 5-gram
    postings with docfreq pruning (stop-shingles with >20 postings
    dropped — the bound that keeps the posting self-join linear),
    and candidates verify with exact Jaccard ≥ 0.5 via the
    inclusion-exclusion identity (2·|∩| ≥ |A|+|B|−|∩|). Per-source
    duplicate rates are the batch's go/no-go quality gate.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    cutoff = d.agg(F.expr("(max(doc_id) * 4) div 5").alias("c"))
    split = d.crossJoin(F.broadcast(cutoff)).select(
        "doc_id",
        "source",
        F.lower("text").alias("t"),
        F.when(F.col("doc_id") < F.col("c"), "existing").otherwise("incoming").alias("corpus"),
    )
    grams = (
        split.filter(F.size(F.split("t", " ")) >= 5)
        .select(
            "doc_id",
            "corpus",
            "source",
            # zip of shifted slices — the i-indexed form re-ran
            # split(t) per element, O(words²·chars) on long docs (see
            # operators/text.py::word_shingles)
            F.explode(
                F.expr(
                    "transform(arrays_zip("
                    " slice(split(t, ' '), 1, size(split(t, ' ')) - 4),"
                    " slice(split(t, ' '), 2, size(split(t, ' ')) - 4),"
                    " slice(split(t, ' '), 3, size(split(t, ' ')) - 4),"
                    " slice(split(t, ' '), 4, size(split(t, ' ')) - 4),"
                    " slice(split(t, ' '), 5, size(split(t, ' ')) - 4)),"
                    " s -> concat_ws(' ', s['0'], s['1'], s['2'], s['3'], s['4']))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    keep = grams.groupBy("g").agg(F.count("*").alias("df")).filter(F.col("df") <= 20)
    pruned = grams.join(keep.select("g"), "g")
    sizes = pruned.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inc = pruned.filter(F.col("corpus") == "incoming").select(
        F.col("doc_id").alias("new_id"), "g"
    )
    ex = pruned.filter(F.col("corpus") == "existing").select(
        F.col("doc_id").alias("old_id"), "g"
    )
    cand = inc.join(ex, "g").groupBy("new_id", "old_id").agg(F.count("*").alias("inter"))
    dup = (
        cand.join(sizes.select(F.col("doc_id").alias("new_id"), F.col("sz").alias("sza")), "new_id")
        .join(sizes.select(F.col("doc_id").alias("old_id"), F.col("sz").alias("szb")), "old_id")
        .filter(F.expr("inter * 2 >= sza + szb - inter"))
        .select("new_id")
        .distinct()
    )
    incoming = split.filter(F.col("corpus") == "incoming")
    return (
        incoming.join(dup, incoming.doc_id == dup.new_id, "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_incoming"),
            F.sum(F.when(F.col("new_id").isNotNull(), 1).otherwise(0)).alias("n_dup"),
            F.expr(
                "sum(CASE WHEN new_id IS NOT NULL THEN 1 ELSE 0 END)"
                " * 1000000 div count(*)"
            ).alias("dup_ppm"),
        )
        .orderBy("source")
    )


@register(
    "c_bitemporal_asof",
    oracle="""
WITH versions AS (
  SELECT p_partkey,
    CAST(round(p_retailprice * 1000, 0) AS BIGINT) AS price_milli,
    TIMESTAMP '1990-01-01' AS valid_from,
    TIMESTAMP '1996-01-01' AS known_from
  FROM part
  UNION ALL
  SELECT p_partkey,
    CAST(round(p_retailprice * 1000, 0) AS BIGINT) * 11 // 10,
    TIMESTAMP '1997-06-01', TIMESTAMP '1997-08-01'
  FROM part
),
lines AS (
  SELECT row_number() OVER () AS rid, l_partkey, l_shipdate FROM lineitem
),
picked AS (
  SELECT l.rid, year(l.l_shipdate) AS yr, v.price_milli,
    row_number() OVER (PARTITION BY l.rid ORDER BY v.valid_from DESC) AS rn
  FROM lines l JOIN versions v
    ON l.l_partkey = v.p_partkey
   AND v.valid_from <= l.l_shipdate
   AND v.known_from <= l.l_shipdate
)
SELECT CAST(yr AS BIGINT) AS yr,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(price_milli) AS BIGINT) AS applied_milli
FROM picked WHERE rn = 1
GROUP BY yr ORDER BY yr
""",
    tags=("C8", "C7", "L"),
)
def c_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL as-of: each fact picks the price version that was
    both EFFECTIVE on its ship date (valid time) and ALREADY KNOWN
    then (transaction time) — the two-axis lookup behind
    as-reported restatement audits. The mid-1997 +10% reprice is
    recorded two months late, so facts shipped in the gap correctly
    apply the OLD price even though the new one was retroactively
    effective — exactly what a naive (valid-time-only, c_scd2_
    point_in_time) lookup gets wrong. Equi-join on the part key with
    both interval predicates as residuals; latest-valid version wins
    via one row_number pick.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    milli = F.round(F.col("p_retailprice") * 1000, 0).cast("long")
    v1 = p.select(
        "p_partkey",
        milli.alias("price_milli"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.lit("1996-01-01").cast("timestamp").alias("known_from"),
    )
    v2 = p.select(
        "p_partkey",
        F.expr("cast(round(p_retailprice * 1000, 0) as bigint) * 11 div 10").alias("price_milli"),
        F.lit("1997-06-01").cast("timestamp").alias("valid_from"),
        F.lit("1997-08-01").cast("timestamp").alias("known_from"),
    )
    versions = v1.unionByName(v2)
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # fixture (measured: 25 duplicate keys at sf0.001) — the per-line
    # pick needs a genuinely unique row id. Engine-LOCAL uniqueness
    # suffices (the output aggregates over picked rows), so a
    # monotonic id here and row_number() OVER () in the oracle are
    # equivalent.
    lines = l.select(
        F.monotonically_increasing_id().alias("rid"), "l_partkey", "l_shipdate"
    )
    joined = lines.join(
        maybe_broadcast(versions, sf_dir, "part"),
        (lines.l_partkey == versions.p_partkey)
        & (versions.valid_from <= lines.l_shipdate)
        & (versions.known_from <= lines.l_shipdate),
    )
    w = Window.partitionBy("rid").orderBy(F.desc("valid_from"))
    picked = joined.select(
        F.year("l_shipdate").alias("yr"),
        "price_milli",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") == 1)
    return (
        picked.groupBy(F.col("yr").cast("long").alias("yr"))
        .agg(F.count("*").alias("n_lines"), F.sum("price_milli").alias("applied_milli"))
        .orderBy("yr")
    )


@register(
    "a_analyze_stats",
    oracle="""
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_rows,
  TRUE AS stats_ok
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("A5", "A1"),
)
def a_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost-based-optimizer statistics surface: CTAS a managed
    table, run ANALYZE TABLE ... COMPUTE STATISTICS, and read the
    recorded rowCount back out of DESCRIBE TABLE EXTENDED — the
    feedback loop that powers CBO join reordering and broadcast
    decisions. stats_ok asserts the ANALYZE-recorded row count
    equals the true count (a stale or missing statistic silently
    degrades every downstream plan, which is why warehouses audit
    it).
    """
    import os as _os

    tbl = f"stats_probe_{_os.getpid()}"  # per-process: warehouse dir is shared
    register_views(spark, sf_dir)
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(
        f"CREATE TABLE {tbl} USING parquet AS"
        " SELECT o_orderpriority FROM orders"
    )
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
    stats_line = next(
        (r["data_type"] for r in desc if r["col_name"] == "Statistics"), ""
    )
    m = re.search(r"(\d+)\s+rows", stats_line)
    analyzed_rows = int(m.group(1)) if m else -1
    true_rows = spark.table(tbl).count()
    stats_ok = analyzed_rows == true_rows
    out = (
        spark.table(tbl)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_rows"))
        .withColumn("stats_ok", F.lit(bool(stats_ok)))
        .orderBy("o_orderpriority")
    )
    rows = out.collect()
    spark.sql(f"DROP TABLE {tbl}")
    return local_df(spark, rows, out.schema)


@register(
    "e_sma_crossover",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY event_type, h
),
rolled AS (
  SELECT event_type, h,
    CAST(sum(x) OVER wf AS BIGINT) AS s_fast, CAST(count(*) OVER wf AS BIGINT) AS n_fast,
    CAST(sum(x) OVER ws AS BIGINT) AS s_slow, CAST(count(*) OVER ws AS BIGINT) AS n_slow
  FROM hourly
  WINDOW wf AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY event_type ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
),
sig AS (
  SELECT event_type, h,
    CASE WHEN s_fast * n_slow > s_slow * n_fast THEN 1 ELSE 0 END AS fast_above
  FROM rolled WHERE n_slow = 24
),
flips AS (
  SELECT event_type, fast_above,
    lag(fast_above) OVER (PARTITION BY event_type ORDER BY h) AS prev
  FROM sig
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_hours,
  CAST(sum(fast_above) AS BIGINT) AS n_fast_above,
  CAST(sum(CASE WHEN prev IS NOT NULL AND fast_above <> prev THEN 1 ELSE 0 END) AS BIGINT)
    AS n_crossings
FROM flips GROUP BY event_type ORDER BY event_type
""",
    tags=("E3", "E2"),
)
def e_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMA crossover signals (6-hour fast vs 24-hour slow moving
    average): 'fast above slow' compares the two means as the
    cross-multiplication S_fast·n_slow > S_slow·n_fast — integer
    sums only, so the signal can't flap on division ulps — and
    crossings count signal flips via lag. Rows before the slow
    window fills (n_slow < 24) are warm-up and excluded identically
    on both engines.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            epoch_us("ts").alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .select("event_type", F.expr("us div 3600000000").alias("h"), "cents")
        .groupBy("event_type", "h")
        .agg(F.sum("cents").alias("x"))
    )
    wf = Window.partitionBy("event_type").orderBy("h").rowsBetween(-5, 0)
    ws = Window.partitionBy("event_type").orderBy("h").rowsBetween(-23, 0)
    rolled = hourly.select(
        "event_type",
        "h",
        F.sum("x").over(wf).alias("s_fast"),
        F.count("*").over(wf).alias("n_fast"),
        F.sum("x").over(ws).alias("s_slow"),
        F.count("*").over(ws).alias("n_slow"),
    )
    sig = rolled.filter(F.col("n_slow") == 24).select(
        "event_type",
        "h",
        F.when(
            F.col("s_fast") * F.col("n_slow") > F.col("s_slow") * F.col("n_fast"), 1
        )
        .otherwise(0)
        .alias("fast_above"),
    )
    w = Window.partitionBy("event_type").orderBy("h")
    flips = sig.select(
        "event_type", "fast_above", F.lag("fast_above").over(w).alias("prev")
    )
    return (
        flips.groupBy("event_type")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("fast_above").alias("n_fast_above"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("fast_above") != F.col("prev")), 1
                ).otherwise(0)
            ).alias("n_crossings"),
        )
        .orderBy("event_type")
    )
