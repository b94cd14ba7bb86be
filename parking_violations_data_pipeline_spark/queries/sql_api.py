"""Full queries expressed through the spark.sql() surface (SURVEY.md
§3.2) — same Catalyst plans as the DataFrame API, registered to prove
the SQL entry point end-to-end on classic analytics shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parking_violations_data_pipeline_spark.catalog import register_views
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
  CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(15,6))
                 * (1 - CAST(l.l_discount AS DECIMAL(15,6)))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
    tags=("C1", "D1", "F3", "SQL"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape via spark.sql(): top returned-revenue customers
    in a quarter. Same plan Catalyst builds for the DataFrame form —
    date filters push to the orders scan, nation broadcasts."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, n.n_name,
          CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(15,6))
                 * (1 - CAST(l.l_discount AS DECIMAL(15,6)))), 2) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
        """
    )


@register(
    "q18_big_orders",
    oracle="""
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
  round(o.o_totalprice, 2) AS totalprice, round(sum(l.l_quantity), 2) AS qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180
)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, o_orderkey LIMIT 25
""",
    tags=("C1", "C4", "D1", "F3", "SQL"),
)
def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape via spark.sql(): large-quantity orders — the
    HAVING subquery decorrelates into a semi join (Catalyst's
    RewritePredicateSubquery), aggregation happens twice at different
    grains."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_orderdate,
          round(o.o_totalprice, 2) AS totalprice, round(sum(l.l_quantity), 2) AS qty
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180
        )
        GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY totalprice DESC, o_orderkey LIMIT 25
        """
    )
