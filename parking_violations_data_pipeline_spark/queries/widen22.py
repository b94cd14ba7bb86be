"""Round-3 widening batch 23: lambda-quantifier higher-order
functions (exists/forall/zip_with), GROUP BY ALL / ORDER BY ALL SQL
sugar, ABC cumulative-share classification, and the price-volume
bridge decomposition — all integer-exact or identically-derived on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table, register_views
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "h_lambda_quantifiers",
    oracle="""
WITH per AS (
  SELECT vec_id, label,
    len(list_filter(embedding, x -> x > 0.25)) > 0              AS has_hot,
    len(list_filter(embedding, x -> NOT (x > -0.9))) = 0        AS all_above,
    CAST(round(list_sum([CAST(embedding[i] AS DOUBLE)
                          * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)
                          FOR i IN generate_series(1, len(embedding))]) * 1000, 0)
         AS BIGINT)                                             AS mirror_dot_milli
  FROM embeddings
)
SELECT label,
  CAST(count(*) AS BIGINT)                       AS n,
  CAST(sum(CASE WHEN has_hot THEN 1 ELSE 0 END) AS BIGINT)  AS n_has_hot,
  CAST(sum(CASE WHEN all_above THEN 1 ELSE 0 END) AS BIGINT) AS n_all_above,
  CAST(sum(mirror_dot_milli) AS BIGINT)          AS sum_mirror_milli
FROM per GROUP BY label ORDER BY label
""",
    tags=("H5",),
)
def h_lambda_quantifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda quantifiers over array columns: exists (any element hot),
    forall (all elements above a floor), and zip_with pairing each
    embedding with its own reversal (an index-aligned two-array
    combine with no explode). All three run as JVM higher-order
    expressions inside codegen — the 100-TB-safe way to scan vector
    columns without Python or a Generate blow-up.

    Determinism: the mirror dot is Σ eᵢ·e₍ₙ₊₁₋ᵢ₎ accumulated left to
    right in BOTH engines (Spark zip_with+aggregate folds in array
    order; the oracle's list comprehension builds the same ordered
    list for list_sum), and each float is widened to double before
    multiply — identical IEEE operation sequence, then one shared
    round to milli-units.
    """
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mirror = F.zip_with(dbl, F.reverse(dbl), lambda a, b: a * b)
    per = e.select(
        "label",
        F.exists(F.col("embedding"), lambda x: x > 0.25).alias("has_hot"),
        F.forall(F.col("embedding"), lambda x: x > -0.9).alias("all_above"),
        F.round(
            F.aggregate(mirror, F.lit(0.0), lambda acc, x: acc + x) * 1000, 0
        ).cast("long").alias("mirror_dot_milli"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            # when/otherwise(0) like the oracle's CASE … ELSE 0: NULL
            # embeddings count 0, never propagate NULL into the sums
            F.sum(F.when(F.col("has_hot"), 1).otherwise(0).cast("long")).alias(
                "n_has_hot"
            ),
            F.sum(
                F.when(F.col("all_above"), 1).otherwise(0).cast("long")
            ).alias("n_all_above"),
            F.sum("mirror_dot_milli").alias("sum_mirror_milli"),
        )
        .orderBy("label")
    )


@register(
    "h_group_by_all",
    oracle="""
SELECT l_returnflag, l_linestatus,
  year(l_shipdate) AS ship_year,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ALL ORDER BY ALL
""",
    tags=("D1", "H2"),
)
def h_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the analyst-SQL sugar (every
    non-aggregate select item becomes a grouping key, then the full
    key list orders the output) that Spark 4 and DuckDB both resolve;
    a green row proves both engines infer the SAME key set and the
    same total order from the identical query text.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT l_returnflag, l_linestatus,
  year(l_shipdate) AS ship_year,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ALL ORDER BY ALL
"""
    )


@register(
    "d_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, cents,
    sum(cents) OVER (ORDER BY cents DESC, l_partkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
    sum(cents) OVER () AS tot_cents
  FROM rev
),
classed AS (
  SELECT cents,
    CASE WHEN cum_cents * 10 <= tot_cents * 7 THEN 'A'
         WHEN cum_cents * 10 <= tot_cents * 9 THEN 'B'
         ELSE 'C' END AS abc
  FROM ranked
)
SELECT abc,
  CAST(count(*) AS BIGINT) AS n_parts,
  CAST(sum(cents) AS BIGINT) AS cents
FROM classed GROUP BY abc ORDER BY abc
""",
    tags=("E3", "D1", "F1"),
)
def d_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, classed
    A/B/C at 70% / 90% cumulative-share cutoffs — the multi-tier
    generalization of q_pareto_80's single cutoff. Share thresholds
    compare in integer ppm with floor division (cum·10⁶ // tot), so
    class boundaries can't flap on double rounding; the running sum
    orders by (cents DESC, partkey) — a total order, so the prefix
    sums are identical on both engines.

    Scale note: the single global running-sum window is the honest
    bottleneck (one-partition sort); at 100 TB the part-grain rollup
    (the data-sized stage) shrinks input to |parts| rows first, and
    the two-pass variant (compute tot_cents separately, range-
    partitioned sort) removes even that if |parts| outgrows a node.
    """
    l = load_table(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents")
    )
    w_cum = (
        Window.orderBy(F.desc("cents"), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy()
    ranked = rev.select(
        "cents",
        F.sum("cents").over(w_cum).alias("cum_cents"),
        F.sum("cents").over(w_tot).alias("tot_cents"),
    )
    # cumulative-share thresholds as CROSS-MULTIPLICATIONS with small
    # constants (cum·10 ≤ tot·7), never cum·10⁶ — the ppm-scaled form
    # overflows bigint once cumulative cents pass ~9.2e12 (measured at
    # the 10× smoke); this form survives any SF
    a_bound = F.col("cum_cents") * 10 <= F.col("tot_cents") * 7
    b_bound = F.col("cum_cents") * 10 <= F.col("tot_cents") * 9
    classed = ranked.select(
        "cents",
        F.when(a_bound, "A").when(b_bound, "B").otherwise("C").alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(F.count("*").alias("n_parts"), F.sum("cents").alias("cents"))
        .orderBy("abc")
    )


@register(
    "q_price_volume_bridge",
    oracle="""
WITH yr AS (
  SELECT p.p_brand AS brand, year(l.l_shipdate) AS y,
    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) IN (1997, 1998)
  GROUP BY p.p_brand, year(l.l_shipdate)
),
wide AS (
  SELECT brand,
    max(CASE WHEN y = 1997 THEN qty END)   AS q0,
    max(CASE WHEN y = 1997 THEN cents END) AS c0,
    max(CASE WHEN y = 1998 THEN qty END)   AS q1,
    max(CASE WHEN y = 1998 THEN cents END) AS c1
  FROM yr GROUP BY brand
  HAVING q0 IS NOT NULL AND q1 IS NOT NULL
),
px AS (
  SELECT brand, q0, c0, q1, c1,
    c0 * 1000 // q0 AS p0_milli,
    c1 * 1000 // q1 AS p1_milli
  FROM wide
)
SELECT brand,
  CAST(c1 - c0 AS BIGINT)                              AS delta_cents,
  CAST((q1 - q0) * p0_milli // 1000 AS BIGINT)         AS volume_effect,
  CAST((p1_milli - p0_milli) * q1 // 1000 AS BIGINT)   AS price_effect,
  CAST(c1 - c0 - (q1 - q0) * p0_milli // 1000
       - (p1_milli - p0_milli) * q1 // 1000 AS BIGINT) AS residual
FROM px ORDER BY brand
""",
    tags=("D1", "C1", "E2"),
)
def q_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge: decompose each brand's 1997→1998 revenue
    change into a volume effect (Δqty at old average price), a price
    effect (Δavg-price at new volume), and the explicit interaction/
    rounding residual — the FP&A waterfall behind every "why did
    revenue move" review. Emitting the residual instead of hiding it
    keeps the bridge additive BY CONSTRUCTION (the four columns sum
    to zero drift), which is what makes it auditable.

    All terms on integer grids: average prices as milli-cents via
    floor division, effects floor-divided back to cents — identical
    integer algebra both engines, no doubles anywhere.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    y = F.year("l_shipdate")
    yr = (
        l.filter(y.isin(1997, 1998))
        .join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), y.alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"),
        )
    )
    wide = (
        yr.groupBy("brand")
        .agg(
            F.max(F.when(F.col("y") == 1997, F.col("qty"))).alias("q0"),
            F.max(F.when(F.col("y") == 1997, F.col("cents"))).alias("c0"),
            F.max(F.when(F.col("y") == 1998, F.col("qty"))).alias("q1"),
            F.max(F.when(F.col("y") == 1998, F.col("cents"))).alias("c1"),
        )
        .filter(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    )
    px = wide.select(
        "brand", "q0", "c0", "q1", "c1",
        F.expr("c0 * 1000 div q0").alias("p0_milli"),
        F.expr("c1 * 1000 div q1").alias("p1_milli"),
    )
    return px.select(
        "brand",
        F.expr("c1 - c0").alias("delta_cents"),
        F.expr("(q1 - q0) * p0_milli div 1000").alias("volume_effect"),
        F.expr("(p1_milli - p0_milli) * q1 div 1000").alias("price_effect"),
        F.expr(
            "c1 - c0 - (q1 - q0) * p0_milli div 1000"
            " - (p1_milli - p0_milli) * q1 div 1000"
        ).alias("residual"),
    ).orderBy("brand")
