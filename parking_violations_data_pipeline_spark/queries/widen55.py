"""Round-3 widening batch 56: the SaaS revenue bridge (new /
expansion / contraction / churn decomposition with exact
conservation) and binary encoding parity (base64 / hex round-trips).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_revenue_bridge_saas",
    oracle="""
WITH yearly AS (
  SELECT o_custkey AS cust, year(o_orderdate) AS y,
    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE year(o_orderdate) IN (1997, 1998)
  GROUP BY cust, y
),
wide AS (
  SELECT cust,
    max(CASE WHEN y = 1997 THEN cents END) AS c97,
    max(CASE WHEN y = 1998 THEN cents END) AS c98
  FROM yearly GROUP BY cust
),
bridge AS (
  SELECT
    CAST(sum(coalesce(c97, 0)) AS BIGINT) AS starting,
    CAST(sum(CASE WHEN c97 IS NULL THEN c98 ELSE 0 END) AS BIGINT) AS new_rev,
    CAST(sum(CASE WHEN c97 IS NOT NULL AND c98 IS NOT NULL AND c98 > c97
                  THEN c98 - c97 ELSE 0 END) AS BIGINT) AS expansion,
    CAST(sum(CASE WHEN c97 IS NOT NULL AND c98 IS NOT NULL AND c98 < c97
                  THEN c97 - c98 ELSE 0 END) AS BIGINT) AS contraction,
    CAST(sum(CASE WHEN c98 IS NULL THEN c97 ELSE 0 END) AS BIGINT) AS churned,
    CAST(sum(coalesce(c98, 0)) AS BIGINT) AS ending
  FROM wide
)
SELECT starting, new_rev, expansion, contraction, churned, ending,
  starting + new_rev + expansion - contraction - churned = ending AS conserves
FROM bridge
""",
    tags=("D1", "B6"),
)
def q_revenue_bridge_saas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SaaS revenue bridge: 1997 revenue walks to 1998 through
    exactly five components — new customers, expansion, contraction,
    churn — and the decomposition CONSERVES BY CONSTRUCTION
    (starting + new + expansion − contraction − churned = ending,
    emitted as a checked boolean on exact cents; a bridge that
    doesn't tie out is the most common board-deck bug). One
    customer-year rollup and one conditional-aggregate pass.
    """
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    yearly = (
        o.filter(y.isin(1997, 1998))
        .groupBy(F.col("o_custkey").alias("cust"), y.alias("y"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))
    )
    wide = yearly.groupBy("cust").agg(
        F.max(F.when(F.col("y") == 1997, F.col("cents"))).alias("c97"),
        F.max(F.when(F.col("y") == 1998, F.col("cents"))).alias("c98"),
    )
    has97 = F.col("c97").isNotNull()
    has98 = F.col("c98").isNotNull()
    bridge = wide.agg(
        F.sum(F.coalesce("c97", F.lit(0))).alias("starting"),
        F.sum(F.when(~has97, F.col("c98")).otherwise(0)).alias("new_rev"),
        F.sum(
            F.when(has97 & has98 & (F.col("c98") > F.col("c97")), F.col("c98") - F.col("c97"))
            .otherwise(0)
        ).alias("expansion"),
        F.sum(
            F.when(has97 & has98 & (F.col("c98") < F.col("c97")), F.col("c97") - F.col("c98"))
            .otherwise(0)
        ).alias("contraction"),
        F.sum(F.when(~has98, F.col("c97")).otherwise(0)).alias("churned"),
        F.sum(F.coalesce("c98", F.lit(0))).alias("ending"),
    )
    return bridge.select(
        "starting",
        "new_rev",
        "expansion",
        "contraction",
        "churned",
        "ending",
        (
            F.col("starting")
            + F.col("new_rev")
            + F.col("expansion")
            - F.col("contraction")
            - F.col("churned")
            == F.col("ending")
        ).alias("conserves"),
    )


@register(
    "h_binary_encoding",
    oracle="""
WITH enc AS (
  SELECT c_custkey,
    base64(encode(c_name)) AS b64,
    lower(hex(encode(c_name))) AS hx
  FROM customer
)
SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(DISTINCT b64) AS BIGINT) AS n_distinct_b64,
  CAST(count(DISTINCT hx) AS BIGINT) AS n_distinct_hex,
  CAST(sum(length(b64)) AS BIGINT) AS total_b64_chars,
  CAST(sum(length(hx)) AS BIGINT) AS total_hex_chars
FROM enc
""",
    tags=("H1", "H4", "B2"),
)
def h_binary_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encoding parity: names encode to UTF-8 bytes, then to
    base64 and hex — the wire formats every export/API layer uses.
    Distinct counts prove injectivity survived both encodings
    (padding and alphabet handled identically), and total encoded
    lengths pin the exact formatting (base64 pads to 4-char groups,
    hex doubles the byte count — both engines must agree to the
    character). Hex case is normalized (Spark emits uppercase,
    DuckDB lowercase — the one formatting divergence, measured).
    """
    c = load_table(spark, sf_dir, "customer")
    enc = c.select(
        # strip chunk linebreaks: Spark's base64 MIME-wraps at 76
        # chars; the unchunked form is the cross-engine wire format
        F.regexp_replace(
            F.base64(F.encode("c_name", "UTF-8")), "[\\r\\n]", ""
        ).alias("b64"),
        F.lower(F.hex(F.encode("c_name", "UTF-8"))).alias("hx"),
    )
    return enc.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("b64").alias("n_distinct_b64"),
        F.countDistinct("hx").alias("n_distinct_hex"),
        F.sum(F.length("b64")).alias("total_b64_chars"),
        F.sum(F.length("hx")).alias("total_hex_chars"),
    )
