"""Round-4 widening batch 89: Laspeyres/Paasche price indices over the
brand basket and the one-big-table denormalization with aggregate
parity proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_price_index",
    oracle="""
WITH yr AS (
  SELECT p.p_brand AS brand, year(l.l_shipdate) AS y,
    sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents,
    sum(CAST(l.l_quantity AS BIGINT)) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY brand, y
),
base AS (SELECT min(y) AS y0, max(y) AS y1 FROM yr),
px AS (
  SELECT b0.brand,
    b0.cents AS c0, b0.qty AS q0,
    b1.cents AS c1, b1.qty AS q1
  FROM yr b0 JOIN yr b1 ON b0.brand = b1.brand
  CROSS JOIN base
  WHERE b0.y = base.y0 AND b1.y = base.y1 AND b0.qty > 0 AND b1.qty > 0
)
SELECT
  CAST(count(*) AS BIGINT) AS n_brands,
  CAST(trunc(sum(CAST(trunc((c1::DECIMAL(38,0) * q0 * 1000000) / q1) AS BIGINT))
       / greatest(sum(c0), 1)) AS BIGINT) AS laspeyres_ppm,
  CAST(trunc((sum(c1)::DECIMAL(38,0) * 1000000)
       / greatest(sum(CAST(trunc((c0::DECIMAL(38,0) * q1) / q0) AS BIGINT)), 1))
       AS BIGINT) AS paasche_ppm
FROM px
""",
    tags=("D1", "C1"),
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres and Paasche price indices between the first and last
    ship years over the brand basket: unit price per brand is
    cents/qty, and the index ratios are computed entirely in integer
    arithmetic — each brand's p1·q0 term is (c1/q1)·q0 expressed as
    c1·q0·10⁶ // q1 in micro-cents BEFORE summation, so no double
    ever forms and both engines agree bit-for-bit. The basket is the
    brand-year rollup (one fact scan + broadcast part dim); the index
    math runs on |brands| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"), F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "cents"
            ),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    base = yr.agg(F.min("y").alias("y0"), F.max("y").alias("y1"))
    b0 = yr.alias("b0")
    b1 = yr.alias("b1")
    px = (
        b0.join(b1, F.col("b0.brand") == F.col("b1.brand"))
        .crossJoin(F.broadcast(base))
        .filter(
            (F.col("b0.y") == F.col("y0"))
            & (F.col("b1.y") == F.col("y1"))
            & (F.col("b0.qty") > 0)
            & (F.col("b1.qty") > 0)
        )
        .select(
            F.col("b0.cents").alias("c0"),
            F.col("b0.qty").alias("q0"),
            F.col("b1.cents").alias("c1"),
            F.col("b1.qty").alias("q1"),
        )
    )
    return px.agg(
        F.count("*").alias("n_brands"),
        # decimal(38) cross-multiplication — the bigint products
        # overflow at sf0.1 (the d_sigma_bands lesson); Spark's decimal
        # `div` returns LONG, DuckDB needs trunc(a/b) (its `//` on
        # DECIMAL is a plain divide)
        F.expr(
            "sum(cast(c1 as decimal(38,0)) * q0 * 1000000 div q1)"
            " div greatest(sum(c0), 1)"
        ).cast("long").alias("laspeyres_ppm"),
        F.expr(
            "cast(sum(c1) as decimal(38,0)) * 1000000"
            " div greatest(sum(cast(c0 as decimal(38,0)) * q1 div q0), 1)"
        ).cast("long").alias("paasche_ppm"),
    )


@register(
    "c_denormalize_obt",
    oracle="""
WITH obt AS (
  SELECT l.l_orderkey, l.l_linenumber,
    CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0) AS BIGINT)
      AS rev_cents,
    o.o_orderpriority, c.c_mktsegment, s.s_nationkey, r.r_name AS region
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT region, c_mktsegment AS segment,
  CAST(count(*) AS BIGINT) AS n_lines,
  CAST(sum(rev_cents) AS BIGINT) AS rev_cents
FROM obt GROUP BY region, segment ORDER BY region, segment
""",
    tags=("C1", "C3", "L"),
)
def c_denormalize_obt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-big-table denormalization: the star schema flattened into a
    single wide fact (every dim joined in — the layout BI warehouses
    materialize to kill join cost at query time), then aggregated at
    (region, segment) grain. All four dims broadcast; the fact
    shuffles ONCE for the final rollup. The oracle computes the same
    rollup from the normalized schema — proving the denormalized
    table answers exactly like the star it came from (the parity a
    warehouse must re-verify after every OBT rebuild)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    obt = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(maybe_broadcast(c, sf_dir, "customer"), o["o_custkey"] == c["c_custkey"])
        .join(maybe_broadcast(s, sf_dir, "supplier"), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            )
            .cast("long")
            .alias("rev_cents"),
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return (
        obt.groupBy("region", "segment")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("rev_cents").alias("rev_cents"),
        )
        .orderBy("region", "segment")
    )
