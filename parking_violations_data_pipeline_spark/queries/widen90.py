"""Round-4 widening batch 90: Luhn check-digit validation and IPv4
integer/dotted-quad conversions — the checksum/network scalar surface
a data-quality pipeline runs at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "h_luhn_check",
    oracle="""
WITH nums AS (
  SELECT o_orderkey, lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS s
  FROM orders WHERE o_orderkey < 4000
),
digits AS (
  SELECT o_orderkey,
    list_sum([
      CASE WHEN (12 - i) % 2 = 0
        THEN CAST(substr(s, i, 1) AS INT)
        ELSE CASE WHEN CAST(substr(s, i, 1) AS INT) * 2 > 9
             THEN CAST(substr(s, i, 1) AS INT) * 2 - 9
             ELSE CAST(substr(s, i, 1) AS INT) * 2 END
      END
      FOR i IN range(1, 13)]) AS luhn_sum
  FROM nums
)
SELECT
  CAST(count(*) AS BIGINT) AS n_keys,
  CAST(count(*) FILTER (WHERE luhn_sum % 10 = 0) AS BIGINT) AS n_valid,
  CAST(sum(luhn_sum) AS BIGINT) AS total_luhn_sum
FROM digits
""",
    tags=("H3", "H4"),
)
def h_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn check-digit validation (the card/IMEI/account-number
    checksum): each order key, zero-padded to 12 digits, is scored by
    the Luhn rule — double every second digit from the right, subtract
    9 when the double exceeds 9, sum all — and a key 'validates' when
    the sum is ≡ 0 (mod 10). Pure higher-order array expressions over
    an index sequence (transform + aggregate, JVM codegen); the oracle
    builds the same sum with a list comprehension. The op a payments
    ingest runs on every record before anything else."""
    nums = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 4000)
        .select(
            "o_orderkey",
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("s"),
        )
    )
    luhn_sum = F.expr(
        """
        aggregate(
          transform(sequence(1, 12), i ->
            CASE WHEN (12 - i) % 2 = 0
              THEN cast(substr(s, i, 1) as int)
              ELSE CASE WHEN cast(substr(s, i, 1) as int) * 2 > 9
                   THEN cast(substr(s, i, 1) as int) * 2 - 9
                   ELSE cast(substr(s, i, 1) as int) * 2 END
            END),
          0, (acc, x) -> acc + x)
        """
    )
    d = nums.select("o_orderkey", luhn_sum.alias("luhn_sum"))
    return d.agg(
        F.count("*").alias("n_keys"),
        F.count(F.when(F.col("luhn_sum") % 10 == 0, 1)).alias("n_valid"),
        F.sum("luhn_sum").alias("total_luhn_sum"),
    )


@register(
    "h_ipv4_funcs",
    oracle="""
WITH ips AS (
  SELECT user_id,
    ((user_id * 2654435761) % 4294967296)::BIGINT AS ip_int
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 200)
),
quad AS (
  SELECT user_id, ip_int,
    CAST(ip_int // 16777216 AS VARCHAR) || '.' ||
    CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' ||
    CAST((ip_int // 256) % 256 AS VARCHAR) || '.' ||
    CAST(ip_int % 256 AS VARCHAR) AS dotted
  FROM ips
),
parsed AS (
  SELECT user_id, ip_int, dotted,
    CAST(string_split(dotted, '.')[1] AS BIGINT) * 16777216 +
    CAST(string_split(dotted, '.')[2] AS BIGINT) * 65536 +
    CAST(string_split(dotted, '.')[3] AS BIGINT) * 256 +
    CAST(string_split(dotted, '.')[4] AS BIGINT) AS reparsed
  FROM quad
)
SELECT
  CAST(count(*) AS BIGINT) AS n_ips,
  bool_and(reparsed = ip_int) AS roundtrip_ok,
  CAST(count(DISTINCT ip_int // 65536) AS BIGINT) AS n_slash16,
  CAST(max(ip_int % 256) AS BIGINT) AS max_last_octet
FROM parsed
""",
    tags=("H1", "H3"),
)
def h_ipv4_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 integer ↔ dotted-quad conversion: synthetic per-user IPs
    (Knuth multiplicative hash mod 2³²) are formatted to dotted-quad
    with integer octet math, re-parsed by splitting the string, and
    proven to round-trip exactly; /16 subnet grouping on the integer
    form. The network-address surface (format, parse, subnet bucket)
    a clickstream geo/abuse pipeline applies to every row — all
    codegen'd integer and string ops, no UDF."""
    ips = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.expr("(user_id * 2654435761L) % 4294967296L").alias("ip_int"),
        )
    )
    quad = ips.select(
        "user_id",
        "ip_int",
        F.concat_ws(
            ".",
            F.expr("cast(ip_int div 16777216 as string)"),
            F.expr("cast((ip_int div 65536) % 256 as string)"),
            F.expr("cast((ip_int div 256) % 256 as string)"),
            F.expr("cast(ip_int % 256 as string)"),
        ).alias("dotted"),
    )
    parsed = quad.select(
        "ip_int",
        F.expr(
            "cast(split(dotted, '\\\\.')[0] as bigint) * 16777216 +"
            "cast(split(dotted, '\\\\.')[1] as bigint) * 65536 +"
            "cast(split(dotted, '\\\\.')[2] as bigint) * 256 +"
            "cast(split(dotted, '\\\\.')[3] as bigint)"
        ).alias("reparsed"),
    )
    return parsed.agg(
        F.count("*").alias("n_ips"),
        F.every(F.col("reparsed") == F.col("ip_int")).alias("roundtrip_ok"),
        F.countDistinct(F.expr("ip_int div 65536")).alias("n_slash16"),
        F.max(F.col("ip_int") % 256).alias("max_last_octet"),
    )
