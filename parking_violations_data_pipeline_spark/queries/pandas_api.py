"""Pandas-API-on-Spark surface (pyspark.pandas).

The reference is a pandas/petl-style row pipeline; its users' most
direct migration path is the pandas API running on the Spark engine.
This entry re-expresses the reference-shaped clean→filter→groupby
stage in pyspark.pandas idioms — same Catalyst plans underneath, so
it is oracle-checked like any DataFrame query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "l_pandas_api_pipeline",
    oracle="""
SELECT o_orderstatus AS status, count(*) AS n,
  round(sum(o_totalprice), 2) AS total, round(avg(o_totalprice), 6) AS mean_price
FROM orders
WHERE o_totalprice > 50000 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    tags=("L", "B1", "B3", "D1"),
)
def l_pandas_api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pandas-style stage on pyspark.pandas: column
    select/rename, boolean-mask filter, isin whitelist, groupby-agg —
    pandas syntax, Spark execution plan."""
    import pyspark.pandas as ps

    psdf = load_table(spark, sf_dir, "orders").pandas_api()
    psdf = psdf[["o_orderstatus", "o_totalprice", "o_orderpriority"]].rename(
        columns={"o_orderstatus": "status", "o_totalprice": "price", "o_orderpriority": "prio"}
    )
    psdf = psdf[(psdf["price"] > 50000) & psdf["prio"].isin(["1-URGENT", "2-HIGH"])]
    g = (
        psdf.groupby("status")
        .agg(n=("price", "count"), total=("price", "sum"), mean_price=("price", "mean"))
        .reset_index()
    )
    out = g.to_spark()
    return (
        out.select(
            "status",
            F.col("n").cast("bigint").alias("n"),
            F.round("total", 2).alias("total"),
            F.round("mean_price", 6).alias("mean_price"),
        )
        .orderBy("status")
    )
