"""Round-4 widening batch 96: the from_csv/to_csv expression pair
(CSV-in-a-column, the message-queue sibling of from_json) and Haar
wavelet energy decomposition of the daily demand signal —
integer-exact multiresolution analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "h_csv_expr",
    oracle="""
WITH built AS (
  SELECT o_orderkey,
    CAST(o_orderkey AS VARCHAR) || ',' || coalesce(o_orderpriority, 'UNKNOWN')
      || ',' ||
      coalesce(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), '')
      AS line
  FROM orders WHERE o_orderkey < 2000
),
parsed AS (
  SELECT o_orderkey,
    CAST(string_split(line, ',')[1] AS BIGINT) AS k,
    string_split(line, ',')[2] AS pri,
    try_cast(string_split(line, ',')[3] AS BIGINT) AS cents
  FROM built
)
SELECT pri,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(cents) AS BIGINT) AS cents,
  bool_and(k = o_orderkey) AS key_roundtrip_ok
FROM parsed GROUP BY pri ORDER BY pri
""",
    tags=("H7", "A2"),
)
def h_csv_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV-in-a-column: to_csv(struct(...)) serializes each order to a
    delimited line and from_csv parses it back with a schema — the
    expression pair for CSV payloads inside message streams (the
    sibling of from_json, exercised far less). The parsed key must
    equal the original on every row, and the re-parsed cents must
    aggregate identically — the oracle rebuilds the same lines with
    plain string concat/split, so the check is semantic, not
    implementation echo."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            # CSV payloads need an explicit NULL policy: priority maps
            # to the 'UNKNOWN' sentinel (from_csv would otherwise read
            # to_csv's empty field back as NULL and shift the check);
            # cents serialize as an empty field -> NULL on re-parse
            F.coalesce("o_orderpriority", F.lit("UNKNOWN")).alias(
                "o_orderpriority"
            ),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents0"),
        )
    )
    built = o.withColumn(
        "line", F.expr("to_csv(struct(o_orderkey, o_orderpriority, cents0))")
    )
    parsed = built.select(
        "o_orderkey",
        F.expr(
            "from_csv(line, 'k BIGINT, pri STRING, cents BIGINT')"
        ).alias("r"),
    ).select("o_orderkey", "r.k", "r.pri", "r.cents")
    return (
        parsed.groupBy("pri")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("cents"),
            F.every(F.col("k") == F.col("o_orderkey")).alias("key_roundtrip_ok"),
        )
        .orderBy("pri")
    )


@register(
    "e_haar_energy",
    oracle="""
WITH spine AS (
  SELECT unnest(range(0, 32)) AS pos
),
daily AS (
  SELECT datediff('day', (SELECT min(CAST(ts AS DATE)) FROM events),
                  CAST(ts AS DATE)) AS pos,
    count(*) AS n
  FROM events GROUP BY pos
),
s0 AS (
  SELECT spine.pos, coalesce(daily.n, 0)::BIGINT AS v
  FROM spine LEFT JOIN daily ON spine.pos = daily.pos
),
-- NOTE: the halved position is aliased to a DIFFERENT name than the
-- child column — DuckDB binds a select alias inside aggregate args
-- (so `pos % 2` would read the halved value), Spark binds the child
-- column; distinct names force identical binding in both engines.
l1 AS (SELECT p0 // 2 AS p1, sum(v) AS a,
       sum(CASE WHEN p0 % 2 = 0 THEN v ELSE -v END) AS d
       FROM (SELECT pos AS p0, v FROM s0) GROUP BY p0 // 2),
l2 AS (SELECT p1 // 2 AS p2, sum(a) AS a,
       sum(CASE WHEN p1 % 2 = 0 THEN a ELSE -a END) AS d
       FROM l1 GROUP BY p1 // 2),
l3 AS (SELECT p2 // 2 AS p3, sum(a) AS a,
       sum(CASE WHEN p2 % 2 = 0 THEN a ELSE -a END) AS d
       FROM l2 GROUP BY p2 // 2),
l4 AS (SELECT p3 // 2 AS p4, sum(a) AS a,
       sum(CASE WHEN p3 % 2 = 0 THEN a ELSE -a END) AS d
       FROM l3 GROUP BY p3 // 2),
l5 AS (SELECT p4 // 2 AS p5, sum(a) AS a,
       sum(CASE WHEN p4 % 2 = 0 THEN a ELSE -a END) AS d
       FROM l4 GROUP BY p4 // 2)
SELECT * FROM (
  SELECT 1 AS level, CAST(count(*) AS BIGINT) AS n_coeffs,
    CAST(sum(d * d) AS BIGINT) AS detail_energy FROM l1
  UNION ALL SELECT 2, CAST(count(*) AS BIGINT), CAST(sum(d * d) AS BIGINT) FROM l2
  UNION ALL SELECT 3, CAST(count(*) AS BIGINT), CAST(sum(d * d) AS BIGINT) FROM l3
  UNION ALL SELECT 4, CAST(count(*) AS BIGINT), CAST(sum(d * d) AS BIGINT) FROM l4
  UNION ALL SELECT 5, CAST(count(*) AS BIGINT), CAST(sum(d * d) AS BIGINT) FROM l5
) ORDER BY level
""",
    tags=("E3", "D1"),
)
def e_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet decomposition of the daily event-count signal,
    padded to 32 days: five halving levels of pairwise sums
    (approximation) and differences (detail), with the detail ENERGY
    per level — the multiresolution fingerprint that locates where a
    series' variance lives (day-to-day noise vs weekly structure).
    Unnormalized Haar keeps every coefficient an INTEGER, so the
    whole transform is bit-exact cross-engine — no √2 ever appears.
    The Spark side folds the same five levels as a driver loop of
    tiny groupBy(pos div 2) stages (level ℓ has 32/2ℓ rows; only the
    first aggregation touches the event table)."""
    e = load_table(spark, sf_dir, "events")
    min_d = e.agg(F.min(F.to_date("ts")).alias("m")).collect()[0]["m"]
    daily = (
        e.groupBy(F.datediff(F.to_date("ts"), F.lit(min_d)).alias("pos"))
        .agg(F.count("*").cast("long").alias("v"))
    )
    spine = spark.range(32).select(F.col("id").cast("int").alias("pos"))
    s = spine.join(daily, "pos", "left").select(
        "pos", F.coalesce("v", F.lit(0)).alias("v")
    )
    levels = []
    cur = s
    for lvl in range(1, 6):
        # same binding discipline as the oracle: the halved position
        # gets a NEW name so aggregate args unambiguously read the
        # child's position column
        nxt = cur.groupBy(F.expr("pos div 2").alias("hpos")).agg(
            F.sum("v").alias("a"),
            F.sum(
                F.when(F.col("pos") % 2 == 0, F.col("v")).otherwise(-F.col("v"))
            ).alias("d"),
        )
        levels.append(
            nxt.agg(
                F.lit(lvl).alias("level"),
                F.count("*").alias("n_coeffs"),
                F.sum(F.col("d") * F.col("d")).alias("detail_energy"),
            )
        )
        cur = nxt.select(F.col("hpos").alias("pos"), F.col("a").alias("v"))
    out = levels[0]
    for nxt in levels[1:]:
        out = out.unionAll(nxt)
    return out.orderBy("level")
