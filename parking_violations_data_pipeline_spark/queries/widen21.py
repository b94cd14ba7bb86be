"""Round-3 widening batch 22: semi-structured round-trip (nested
JSON build → schema-on-read shred), effective-dated SCD2 point-in-time
lookup (the warehouse join shape distinct from event as-of), and
rolling-median window frames (aggregate-as-window with a bounded
frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "h_nested_shred",
    oracle="""
SELECT l_returnflag,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("H7", "H5", "B2"),
)
def h_nested_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested semi-structured round-trip: lineitems are packed into
    one JSON document per order (array-of-structs payload, the shape
    ingestion actually receives from APIs), then shredded back with
    an explicit schema — to_json(struct(collect_list(...))) →
    from_json → explode — and re-aggregated. The oracle computes the
    same aggregate straight from the relational source, so a green
    row proves the build→parse→flatten path is LOSSLESS (no dropped
    array elements, no type coercion drift through the string form).
    collect_list order is made deterministic with sort_array before
    serialization; arrays exist only mid-plan, never in the output.
    """
    l = load_table(spark, sf_dir, "lineitem")
    line = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_returnflag").alias("rf"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    docs = (
        l.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(line)).alias("lines"))
        .select(
            "l_orderkey",
            F.to_json(F.struct(F.col("l_orderkey").alias("ok"), F.col("lines"))).alias("doc"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("ok", T.LongType()),
            T.StructField(
                "lines",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("ln", T.IntegerType()),
                            T.StructField("rf", T.StringType()),
                            T.StructField("qty", T.LongType()),
                            T.StructField("cents", T.LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    shredded = (
        docs.select(F.from_json("doc", schema).alias("p"))
        .select(F.col("p.ok").alias("ok"), F.explode("p.lines").alias("line"))
        .select("ok", "line.rf", "line.qty", "line.cents")
    )
    return (
        shredded.groupBy(F.col("rf").alias("l_returnflag"))
        .agg(
            F.sum("qty").alias("qty"),
            F.sum("cents").alias("cents"),
            F.count("*").alias("n_lines"),
            F.countDistinct("ok").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "c_scd2_point_in_time",
    oracle="""
WITH versions AS (
  SELECT c_custkey, c_mktsegment AS segment,
    TIMESTAMP '1990-01-01' AS valid_from,
    CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '1997-06-01' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MIGRATED-' || c_mktsegment AS segment,
    TIMESTAMP '1997-06-01' AS valid_from, NULL AS valid_to
  FROM customer WHERE c_custkey % 3 = 0
),
pit AS (
  SELECT o.o_orderkey, v.segment,
    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN versions v
    ON o.o_custkey = v.c_custkey
   AND o.o_orderdate >= v.valid_from
   AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
)
SELECT segment,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(cents) AS BIGINT) AS cents
FROM pit GROUP BY segment ORDER BY segment
""",
    tags=("C7", "C8", "L"),
)
def c_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against an effective-dated SCD type-2
    dimension: every fact row joins the dimension VERSION that was
    valid on its transaction date (valid_from ≤ date < valid_to,
    open-ended current rows) — the query shape every
    as-reported-vs-as-restated audit runs. The version table here is
    built in-plan (each 3rd customer re-segments mid-1997, the
    etl_scd2_merge shape) so the entry is self-contained.

    Scale: the join is an EQUI-join on the business key with the
    interval predicate as a residual — per-key version counts are
    tiny (≤2 here, rarely >10 in practice), so the residual never
    multiplies; the dimension side broadcasts. Every fact row matches
    EXACTLY one version (intervals partition the timeline), which the
    oracle's row count re-proves.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    mig = F.col("c_custkey") % 3 == 0
    split = F.lit("1997-06-01").cast("timestamp")
    v1 = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.when(mig, split).alias("valid_to"),
    )
    v2 = c.filter(mig).select(
        "c_custkey",
        F.concat(F.lit("MIGRATED-"), F.col("c_mktsegment")).alias("segment"),
        split.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    versions = v1.unionByName(v2)
    pit = o.join(
        maybe_broadcast(versions, sf_dir, "customer"),
        (o.o_custkey == versions.c_custkey)
        & (o.o_orderdate >= versions.valid_from)
        & (versions.valid_to.isNull() | (o.o_orderdate < versions.valid_to)),
    )
    return (
        pit.groupBy("segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"),
        )
        .orderBy("segment")
    )


@register(
    "e_rolling_median",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'click') AND ts IS NOT NULL
),
med AS (
  SELECT event_type,
    median(cents) OVER (PARTITION BY event_type ORDER BY us, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS m
  FROM e
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(m * 2 AS BIGINT)) AS BIGINT) AS sum_2x_med,
  CAST(max(CAST(m * 2 AS BIGINT)) AS BIGINT) AS max_2x_med
FROM med GROUP BY event_type ORDER BY event_type
""",
    tags=("E3", "D5"),
)
def e_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over a bounded 5-row frame — an arbitrary
    aggregate used AS a window function (percentile/median has no
    incremental frame update, so the engine re-evaluates per frame;
    bounded frames keep that O(frame) per row, which is why
    production rolling-median always fixes the frame). Exactness:
    cents are integers, the even-count median is the midpoint of two
    integers, so 2×median is always integral — both engines emit it
    bit-exactly; ties on ts break by event_id (total order).
    """
    e = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("purchase", "click")
            & F.col("ts").isNotNull()  # rolling frame is event-time-ordered
        )
        .select(
            "event_type",
            epoch_us("ts").alias("us"),
            "event_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    med = e.select(
        "event_type",
        F.percentile(F.col("cents"), F.lit(0.5)).over(w).alias("m"),
    )
    two_m = (F.col("m") * 2).cast("long")
    return (
        med.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(two_m).alias("sum_2x_med"),
            F.max(two_m).alias("max_2x_med"),
        )
        .orderBy("event_type")
    )
