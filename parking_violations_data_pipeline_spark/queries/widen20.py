"""Round-3 widening batch 21: revenue-recognition calendarization
(pro-rata allocation with exact largest-remainder integer splitting),
the late-arriving-dimension warehouse pattern (placeholder join +
backfill resolution audit), and the hashing-trick feature cross with
measured collision accounting.

House rules: identical aliases both sides, all money on the integer
cent grid, md5-hex arithmetic for any cross-engine hash, total-order
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_prorata_monthly",
    oracle="""
WITH o AS (
  SELECT o_orderkey,
    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m0,
    CAST(1 + o_orderkey % 5 AS BIGINT) AS span,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
alloc AS (
  SELECT m0 + j AS m,
    cents // span + CASE WHEN j < cents % span THEN 1 ELSE 0 END AS a_cents
  FROM o, unnest(generate_series(0, span - 1)) AS t(j)
)
SELECT CAST(m AS BIGINT) AS month_idx,
  CAST(sum(a_cents) AS BIGINT) AS alloc_cents,
  CAST(count(*) AS BIGINT) AS n_slices
FROM alloc GROUP BY m ORDER BY m
""",
    tags=("H2", "D1", "L"),
)
def q_prorata_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-recognition calendarization: each order's total is
    spread pro-rata across its service period (1-5 months, derived
    deterministically from the order key) with LARGEST-REMAINDER
    integer allocation — month j gets cents//n plus one extra cent
    while j < cents%n — so per-order allocations sum back to the
    order total EXACTLY (no lost or invented cents, the invariant
    auditors actually check). Spark side is a pure map stage:
    sequence() + posexplode, no join; the only shuffle is the final
    month rollup. At 100 TB the explode factor is bounded (≤5×) and
    partial aggregation absorbs it map-side.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m0"),
        (1 + F.col("o_orderkey") % 5).alias("span"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    alloc = base.select(
        "m0",
        "cents",
        "span",
        F.posexplode(F.sequence(F.lit(0), F.col("span") - 1)).alias("j", "_v"),
    ).select(
        (F.col("m0") + F.col("j")).alias("month_idx"),
        (
            F.expr("cents div span")
            + F.when(F.col("j") < F.col("cents") % F.col("span"), 1).otherwise(0)
        ).alias("a_cents"),
    )
    return (
        alloc.groupBy("month_idx")
        .agg(F.sum("a_cents").alias("alloc_cents"), F.count("*").alias("n_slices"))
        .select(F.col("month_idx").cast("long").alias("month_idx"), "alloc_cents", "n_slices")
        .orderBy("month_idx")
    )


@register(
    "etl_late_arriving_dim",
    oracle="""
WITH early_dim AS (
  SELECT * FROM customer WHERE c_custkey % 97 <> 0
),
phase1 AS (
  -- o_custkey rides along: re-joining orders on a (possibly
  -- duplicated) orderkey would fan the facts a second time
  SELECT o.o_orderkey, o.o_custkey,
    coalesce(d.c_mktsegment, 'UNKNOWN') AS segment,
    CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o LEFT JOIN early_dim d ON o.o_custkey = d.c_custkey
),
resolved AS (
  SELECT p.o_orderkey,
    CASE WHEN p.segment = 'UNKNOWN' THEN c.c_mktsegment ELSE p.segment END AS segment,
    CASE WHEN p.segment = 'UNKNOWN' THEN 1 ELSE 0 END AS was_placeholder,
    p.cents
  FROM phase1 p JOIN customer c ON p.o_custkey = c.c_custkey
)
SELECT segment,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(was_placeholder) AS BIGINT) AS n_backfilled,
  CAST(sum(cents) AS BIGINT) AS cents
FROM resolved GROUP BY segment ORDER BY segment
""",
    tags=("C2", "L", "A5"),
)
def etl_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving-dimension handling: facts are enriched against a
    dimension snapshot that is MISSING some members (every 97th
    customer hasn't replicated yet), land with an 'UNKNOWN'
    placeholder instead of being dropped or stalled, and a later
    backfill pass re-keys the placeholders once the full dimension
    arrives — emitting per-segment totals plus the backfill audit
    count (how many rows were served under a placeholder). Both
    joins are broadcast (dimension side); the placeholder path never
    loses a fact row, proven because per-segment cents re-sum to the
    raw order total under the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    early = c.filter(F.col("c_custkey") % 97 != 0).select("c_custkey", "c_mktsegment")
    phase1 = (
        o.join(maybe_broadcast(early, sf_dir, "customer"), o.o_custkey == early.c_custkey, "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    full_dim = c.select(
        F.col("c_custkey").alias("bk"), F.col("c_mktsegment").alias("true_segment")
    )
    resolved = phase1.join(maybe_broadcast(full_dim, sf_dir, "customer"), phase1.o_custkey == F.col("bk")).select(
        F.when(F.col("segment") == "UNKNOWN", F.col("true_segment"))
        .otherwise(F.col("segment"))
        .alias("segment"),
        F.when(F.col("segment") == "UNKNOWN", 1).otherwise(0).alias("was_placeholder"),
        "cents",
    )
    return (
        resolved.groupBy("segment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("was_placeholder").alias("n_backfilled"),
            F.sum("cents").alias("cents"),
        )
        .orderBy("segment")
    )


@register(
    "l_hashed_cross",
    oracle="""
WITH crossed AS (
  SELECT c.c_custkey,
    c.c_mktsegment || '#' || n.n_name AS cross_val,
    md5(c.c_mktsegment || '#' || n.n_name) AS h
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
bucketed AS (
  SELECT c_custkey, cross_val,
    ((ascii(substr(h, 1, 1)) - CASE WHEN ascii(substr(h, 1, 1)) >= 97 THEN 87 ELSE 48 END) * 16
     + (ascii(substr(h, 2, 1)) - CASE WHEN ascii(substr(h, 2, 1)) >= 97 THEN 87 ELSE 48 END)
    ) % 64 AS bucket
  FROM crossed
)
SELECT CAST(bucket AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(DISTINCT cross_val) AS BIGINT) AS n_crosses
FROM bucketed GROUP BY bucket ORDER BY bucket
""",
    tags=("L", "H4", "J13"),
)
def l_hashed_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick for categorical feature crosses: the
    (market segment × nation) cross — 125 raw combinations — is
    hashed into 64 buckets, the fixed-width representation a model
    trains on without a vocabulary build. Output is the per-bucket
    load table: row count plus DISTINCT source crosses per bucket,
    which MEASURES the collision rate the dimensionality squeeze
    introduced (n_crosses > 1 ⇒ features aliased together) — the
    audit that decides whether 64 buckets is too few. Bucket = first
    two md5 hex digits mod 64 via explicit ascii arithmetic, the one
    hash both engines share; nation is a broadcast dim join.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    # concat (NULL-propagating, like the oracle's ||), NOT concat_ws:
    # a NULL segment/name must produce a NULL cross (unbucketable),
    # not silently collapse to the other field's hash
    crossed = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("n_name")).alias(
            "cross_val"
        )
    )
    h = F.md5(F.col("cross_val"))

    def hexdigit(i: int):
        a = F.ascii(F.substring(h, i, 1))
        return a - F.when(a >= 97, 87).otherwise(48)

    bucket = (hexdigit(1) * 16 + hexdigit(2)) % 64
    return (
        crossed.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("cross_val").alias("n_crosses"),
        )
        .orderBy("bucket")
    )
