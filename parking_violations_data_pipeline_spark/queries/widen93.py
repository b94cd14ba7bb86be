"""Round-4 widening batch 93: SQL-defined functions (scalar + table —
the Spark 4 CREATE FUNCTION surface) and SQL scripting
(BEGIN/DECLARE/WHILE control flow executed server-side).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "h_sql_udf",
    oracle="""
WITH tiers AS (SELECT unnest(range(1, 4)) AS tier)
SELECT t.tier,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT))
       AS BIGINT) AS rev_cents
FROM lineitem l JOIN tiers t
  ON l.l_quantity > (t.tier - 1) * 15 AND l.l_quantity <= t.tier * 15
GROUP BY t.tier ORDER BY t.tier
""",
    tags=("H3", "K1"),
)
def h_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions — Spark 4's CREATE FUNCTION surface, the
    UDF that never leaves the JVM: a scalar SQL UDF (revenue in exact
    cents) and a TABLE function (quantity-tier generator) are declared
    in SQL, and because their bodies are Catalyst expressions they
    inline into the plan — full codegen, pushdown, none of the Python
    serialization tax of K1. The query buckets lineitems into the
    table-function's tiers and totals revenue through the scalar
    function. Session-scoped names are pid-suffixed (the concurrent
    gate lesson)."""
    pid = os.getpid()
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView(f"li_sqludf_{pid}")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION rev_cents_{pid}(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(p * (1 - d) * 100, 0) AS BIGINT)"
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION qty_tiers_{pid}(n INT) "
        "RETURNS TABLE(tier INT) RETURN SELECT explode(sequence(1, n)) AS tier"
    )
    return spark.sql(
        f"""
        SELECT t.tier,
          count(*) AS n_lines,
          sum(rev_cents_{pid}(l.l_extendedprice, l.l_discount)) AS rev_cents
        FROM li_sqludf_{pid} l JOIN qty_tiers_{pid}(3) t
          ON l.l_quantity > (t.tier - 1) * 15 AND l.l_quantity <= t.tier * 15
        GROUP BY t.tier ORDER BY t.tier
        """
    )


@register(
    "h_sql_scripting",
    oracle="""
WITH thresholds AS (
  SELECT unnest(range(0, 40)) AS k
),
counts AS (
  SELECT k, power(2, k)::BIGINT AS t,
    (SELECT count(*) FROM orders
     WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > power(2, k)::BIGINT)
      AS n_above
  FROM thresholds
)
SELECT CAST(t AS BIGINT) AS threshold_cents,
  CAST(n_above AS BIGINT) AS n_above
FROM counts WHERE n_above < 100 ORDER BY k LIMIT 1
""",
    tags=("H3", "B6"),
)
def h_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN/DECLARE/WHILE): an iterative
    threshold search — double a cents threshold until fewer than 100
    orders exceed it — runs ENTIRELY inside one spark.sql() call with
    server-side control flow; the loop variables live in session
    variables. Round-11 (guide §1.2 step 1): the loop used to issue a
    full distributed count PER ITERATION (~27 scans of orders to find
    the fixed point); every count it can ever need is count_if(c > 2^k)
    for k = 0..62, so ONE aggregate pass now fills a session-variable
    map and the WHILE walks the map — same doubling search over
    bit-identical counts (count_if(c > t) ≡ count(*) WHERE c > t; NULL
    cents excluded by both), one scan instead of one per iteration.
    n_above(2^62) = 0 < 100 bounds the walk inside the map's keys. The
    oracle finds the same fixed point declaratively (min power of two
    with count < 100) — proving the imperative search and the
    declarative formulation agree."""
    pid = os.getpid()
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView(f"orders_script_{pid}")
    pairs = ", ".join(
        f"{1 << k}L, count_if(c > {1 << k}L)" for k in range(63)
    )
    return spark.sql(
        f"""
        BEGIN
          DECLARE hist MAP<BIGINT, BIGINT>;
          DECLARE t BIGINT DEFAULT 1;
          DECLARE n BIGINT DEFAULT 9223372036854775807;
          SET hist = (
            SELECT map({pairs})
            FROM (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
                  FROM orders_script_{pid})
          );
          WHILE element_at(hist, t) >= 100 DO
            SET t = t * 2;
          END WHILE;
          SET n = element_at(hist, t);
          SELECT t AS threshold_cents, n AS n_above;
        END
        """
    )
