"""Advanced operators: as-of join, skew-salted join, the UDF/UDTF
surface, and multimodal binary plumbing (SURVEY.md §2 C8/C10/K, plus
the multimodal driver mandate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.operators import multimodal as MM
from parking_violations_data_pipeline_spark.operators.asof import asof_join
from parking_violations_data_pipeline_spark.operators.skew import salted_join
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register


@register(
    "c_asof_join",
    oracle="""
WITH rates AS (
  SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS rts,
         round(avg(value), 6) AS rate
  FROM events WHERE day(CAST(ts AS TIMESTAMP)) % 3 = 0
  GROUP BY event_type, rts
)
SELECT e.event_type, count(*) AS cnt, round(sum(r.rate), 6) AS sum_rate
FROM (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events) e
ASOF JOIN rates r ON e.event_type = r.event_type AND e.ts >= r.rts
GROUP BY e.event_type ORDER BY e.event_type
""",
    tags=("C8",),
)
def c_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: as-of join — each event picks the latest prior daily rate
    (rates exist only every 3rd day, so probes really look backward).
    Spark side: union + last-non-null window (one shuffle, no range
    explosion); oracle: DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    rates = (
        ev.filter(F.dayofmonth("ts") % 3 == 0)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("rts"))
        .agg(F.round(F.avg("value"), 6).alias("rate"))
    )
    joined = asof_join(
        ev.select("event_type", "ts"),
        rates,
        on=["event_type"],
        left_time="ts",
        right_time="rts",
        payload=["rate"],
        how="inner",
    )
    return (
        joined.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("rate"), 6).alias("sum_rate"))
        .orderBy("event_type")
    )


@register(
    "c_asof_tolerance",
    oracle="""
WITH rates AS (
  SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS rts,
         round(avg(value), 6) AS rate
  FROM events WHERE day(CAST(ts AS TIMESTAMP)) % 3 = 0
  GROUP BY event_type, rts
)
SELECT e.event_type, count(*) AS cnt, round(sum(r.rate), 6) AS sum_rate
FROM (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events) e
ASOF JOIN rates r ON e.event_type = r.event_type AND e.ts >= r.rts
WHERE e.ts - r.rts <= INTERVAL 1 DAY
GROUP BY e.event_type ORDER BY e.event_type
""",
    tags=("C8",),
)
def c_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 variant: as-of join with a staleness bound (pandas
    merge_asof tolerance semantics) — rates exist only every 3rd day,
    so a 1-day tolerance genuinely drops the probes whose latest rate
    is 2 days stale (vs c_asof_join, which keeps them). The bound is
    one comparison against the version time carried inside the payload
    struct — same single-shuffle plan as the unbounded join. Oracle:
    DuckDB native ASOF JOIN + the same staleness predicate."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    rates = (
        ev.filter(F.dayofmonth("ts") % 3 == 0)
        .groupBy("event_type", F.date_trunc("day", "ts").alias("rts"))
        .agg(F.round(F.avg("value"), 6).alias("rate"))
    )
    joined = asof_join(
        ev.select("event_type", "ts"),
        rates,
        on=["event_type"],
        left_time="ts",
        right_time="rts",
        payload=["rate"],
        how="inner",
        tolerance="1 DAY",
    )
    return (
        joined.groupBy("event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("rate"), 6).alias("sum_rate"))
        .orderBy("event_type")
    )


@register(
    "k_grouped_map",
    oracle="""
SELECT o_orderpriority, o_orderkey, cents FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                                     o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2 ORDER BY o_orderpriority, cents DESC, o_orderkey
""",
    tags=("K3", "E4"),
)
def k_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K widening: grouped-map applyInPandas — the per-group arbitrary
    pandas transform (vs k_grouped_agg_udaf's scalar GROUPED_AGG).
    Each priority group's Arrow batch is reduced in pandas to its top-2
    orders by exact cents with the orderkey tie-break; outputs are all
    integers, so the pandas path can't drift from the SQL oracle.

    Same caveats as every K entry: this is the survey of the Python
    surface — the equivalent window expression (the oracle) is what
    the hot path should use, and the plan shows the Arrow exchange
    (FlatMapGroupsInPandas) this boundary costs.
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["cents", "o_orderkey"], ascending=[False, True]
        ).head(2)

    out = o.groupBy("o_orderpriority").applyInPandas(
        top2, schema="o_orderpriority string, o_orderkey long, cents long"
    )
    return out.orderBy("o_orderpriority", F.desc("cents"), "o_orderkey")


@register(
    "c_skew_salted_join",
    oracle="""
WITH dim(o_orderpriority, weight) AS (VALUES ('1-URGENT', 5.0), ('2-HIGH', 4.0),
      ('3-MEDIUM', 3.0), ('4-NOT SPECIFIED', 2.0), ('5-LOW', 1.0))
SELECT CAST(d.weight AS DOUBLE) AS weight, count(*) AS cnt,
  round(sum(o.o_totalprice * CAST(d.weight AS DOUBLE)), 2) AS wtotal
FROM orders o JOIN dim d USING (o_orderpriority)
GROUP BY d.weight ORDER BY weight
""",
    tags=("C10",),
)
def c_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: explicitly salted join — the fact side hashes into 8 shards
    per key, the dim side is replicated 8× — identical results to the
    plain join (the oracle), even partition sizes under hot keys."""
    o = load_table(spark, sf_dir, "orders")
    dim = local_df(
        spark,
        [("1-URGENT", 5.0), ("2-HIGH", 4.0), ("3-MEDIUM", 3.0),
         ("4-NOT SPECIFIED", 2.0), ("5-LOW", 1.0)],
        "o_orderpriority string, weight double",
    )
    joined = salted_join(o, dim, on=["o_orderpriority"], salt=8)
    return (
        joined.groupBy("weight")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(F.col("o_totalprice") * F.col("weight")), 2).alias("wtotal"),
        )
        .orderBy("weight")
    )


@register(
    "k_scalar_udf",
    oracle="""
SELECT CASE WHEN o_totalprice IS NULL THEN NULL
            WHEN o_totalprice < 100000 THEN 'S'
            WHEN o_totalprice < 250000 THEN 'M' ELSE 'L' END AS bucket,
  count(*) AS cnt
FROM orders GROUP BY bucket ORDER BY bucket
""",
    tags=("K1",),
)
def k_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: row-at-a-time Python UDF (deliberately — the slow-path
    surface; every other query avoids this). Same bucketing the B6
    CASE ladder does natively."""

    @F.udf(T.StringType())
    def bucket(p: float) -> str:
        if p is None:  # SQL NULL in, NULL out (oracle mirrors)
            return None
        return "S" if p < 100000 else ("M" if p < 250000 else "L")

    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(bucket("o_totalprice").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "k_pandas_udf",
    oracle="""
SELECT l_returnflag, round(sum(round(l_extendedprice * (1 - l_discount), 6)), 4) AS disc_total
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("K2",),
)
def k_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: Arrow-batched scalar pandas UDF — float64 vector math in
    numpy, identical IEEE results to the engines' double arithmetic."""

    @F.pandas_udf(T.DoubleType())
    def disc_price(e: pd.Series, d: pd.Series) -> pd.Series:
        return (e * (1 - d)).round(6)

    li = load_table(spark, sf_dir, "lineitem")
    # round(…,4): the products are exact 4-decimal values, so their true
    # sum lies ON the 4-decimal grid — rounding to that grid is immune to
    # summation-order ulps, while round(…,2) sits on half-cent boundaries
    return (
        li.select("l_returnflag", disc_price("l_extendedprice", "l_discount").alias("dp"))
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("dp"), 4).alias("disc_total"))
        .orderBy("l_returnflag")
    )


@register(
    "k_grouped_agg_udaf",
    oracle="""
SELECT l_returnflag,
  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("K3",),
)
def k_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: GROUPED_AGG pandas UDF (custom UDAF): quantity-weighted
    mean price per group."""

    @F.pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price"))
        .orderBy("l_returnflag")
    )


@register(
    "k_udtf",
    oracle="""
SELECT len AS word_len, count(*) AS cnt
FROM (SELECT length(unnest(string_split(text, ' '))) AS len FROM documents)
WHERE len > 0 GROUP BY len ORDER BY len
""",
    tags=("K4",),
)
def k_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: Spark 4 Python UDTF — one input row expands to one row per
    token (length histogram proves the expansion)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word_len int")
    class Explode:
        def eval(self, text: str):
            if text is None:  # string_split(NULL) expands to no rows
                return
            for w in text.split(" "):
                if w:
                    yield (len(w),)

    Explode_reg = Explode  # local name for lambda-free registration
    spark.udtf.register("explode_words", Explode_reg)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT t.word_len, count(*) AS cnt
        FROM __docs_udtf, LATERAL explode_words(text) t
        GROUP BY t.word_len ORDER BY t.word_len
        """
    )


@register(
    "m_binary_meta",
    oracle="""
WITH b AS (SELECT doc_id, text,
                  string_split(hex(encode(text)), '') AS hc FROM documents)
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
  -- true UTF-8 BYTE sum via the hex dump split to a CHAR LIST once:
  -- per-index substring() re-scans the whole string (O(n) each, O(n²)
  -- per doc — 50 s on a 200k-char doc; measured) where list indexing
  -- is O(1). The old characterwise unicode() form only matched the
  -- engine's byte path on pure ASCII.
  CAST(CASE WHEN text IS NULL THEN NULL ELSE coalesce(list_sum(
    [16*(instr('0123456789ABCDEF', hc[2*i-1])-1)
       + (instr('0123456789ABCDEF', hc[2*i])-1)
     FOR i IN range(1, len(hc)//2 + 1)]), 0) % 997 END AS INT) AS byte_mod
FROM b ORDER BY doc_id
""",
    tags=("MM", "K2"),
)
def m_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: binary payload + metadata plumbing, feature
    extraction via mapInPandas (Arrow batches). The byte-sum feature is
    recomputed characterwise by the oracle — proving the binary path
    preserves content exactly."""
    d = load_table(spark, sf_dir, "documents")
    feats = MM.fake_features(MM.attach_binary(d))
    return feats.select("doc_id", "n_bytes", "byte_mod").orderBy("doc_id")


@register(
    "m_resize_pool",
    oracle="""
SELECT doc_id, CAST(bucket AS INT) AS pos,
  CAST(sum(val) // count(*) AS BIGINT) AS pooled
FROM (
  -- pool over UTF-8 BYTES decoded from the hex dump ONCE into a list
  -- (per-index substring re-scans the string: O(n²)/doc, 88 s on a
  -- 200k-char doc — measured); rid keeps pooling PER SOURCE ROW —
  -- duplicate doc_ids are separate payloads
  SELECT doc_id, rid,
         unnest(vals) AS val,
         unnest(range(1, len(vals) + 1)) AS i,
         ((i - 1) * 16) // len(vals) AS bucket
  FROM (SELECT doc_id, rid,
          [16*(instr('0123456789ABCDEF', hc[2*j-1])-1)
             + (instr('0123456789ABCDEF', hc[2*j])-1)
           FOR j IN range(1, len(hc)//2 + 1)] AS vals
        FROM (SELECT doc_id, string_split(hex(encode(text)), '') AS hc,
                     row_number() OVER (ORDER BY doc_id, text) AS rid
              FROM documents WHERE octet_length(encode(text)) > 0))
)
GROUP BY doc_id, rid, bucket ORDER BY doc_id, pos
""",
    tags=("MM", "K2"),
)
def m_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: resize/downscale plumbing — average-pool each
    payload's bytes into 16 fixed cells (the 1-D analog of image
    downscaling) via a numpy bincount inside mapInPandas. Cell
    assignment (j*16//n) and the pooled integer mean (sum//count) are
    exact integer arithmetic, so the oracle re-derives every cell
    characterwise — the Arrow batch path is proven byte-exact, and a
    real resize kernel drops into the same operator unchanged."""
    d = load_table(spark, sf_dir, "documents")
    return (
        MM.resize_pool(MM.attach_binary(d), buckets=16)
        .orderBy("doc_id", "pos")
    )


@register(
    "m_frame_sample",
    oracle="""
SELECT doc_id, CAST(o AS INT) AS "offset",
  -- every 64th UTF-8 BYTE via the hex dump (characterwise only
  -- matched the engine's byte path on pure ASCII). Per-index
  -- substring is fine HERE: only n/64 rows exist, and carrying the
  -- hex STRING per row is cheap where carrying a char LIST per
  -- unnested row is not (measured 225 s — lists materialize per row)
  16*(instr('0123456789ABCDEF', substring(h, 2*o+1, 1))-1)
    + (instr('0123456789ABCDEF', substring(h, 2*o+2, 1))-1) AS byte_val
FROM (SELECT doc_id, hex(encode(text)) AS h,
             unnest(range(0, octet_length(encode(text)), 64)) AS o
      FROM documents)
ORDER BY doc_id, "offset"
""",
    tags=("MM",),
)
def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: frame-sampling expansion (every 64th byte as a
    'frame') — the mapInPandas row-expansion shape a video pipeline
    needs. Deterministic on ASCII payloads, so the oracle re-derives
    every sampled byte characterwise."""
    d = load_table(spark, sf_dir, "documents")
    return (
        MM.sample_frames(MM.attach_binary(d), every_n_bytes=64)
        .orderBy("doc_id", "offset")
    )
