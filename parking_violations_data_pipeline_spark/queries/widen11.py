"""Round-3 widening batch 12: the feature-engineering layer of a
training pipeline — leakage-safe target encoding (leave-one-out +
smoothing), equi-depth quantile binning at compressed grain, a
deterministic hash-based grouped train/test split with a leakage
audit, and explicit two-level mergeable partial aggregation (the
map-side-combine algebra made visible).

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles either rounded on both
sides or IDENTICAL-BY-CONSTRUCTION (same exact-integer inputs through
the same expression — then left unrounded, because rounding the same
double can itself diverge across engines near .5 boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "l_target_encode_loo",
    oracle="""
WITH t AS (
  SELECT o_orderpriority AS cat,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
cat_stats AS (
  SELECT cat, CAST(count(*) AS BIGINT) AS n_c,
         CAST(sum(y) AS BIGINT) AS sum_c
  FROM t GROUP BY cat
),
gstat AS (
  SELECT CAST(sum(y) AS BIGINT) * 1.0 / count(*) AS g FROM t
),
enc AS (
  SELECT t.cat,
         (cs.sum_c - t.y + 10 * gstat.g) / (cs.n_c - 1 + 10) AS te
  FROM t JOIN cat_stats cs ON t.cat = cs.cat, gstat
)
SELECT cat,
  CAST(count(*) AS BIGINT) AS n,
  min(te)                  AS te_min,
  max(te)                  AS te_max
FROM enc GROUP BY cat ORDER BY cat
""",
    tags=("D1", "C3", "K1"),
)
def l_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing (m=10
    pseudo-observations of the global mean) — the category feature
    that does NOT leak the row's own label: each row's encoding
    averages every OTHER row's target in its category, shrunk toward
    the global mean. The naive per-category mean is the classic
    train-time leak.

    Scale shape: category stats are a 5-row aggregate BROADCAST back
    onto the fact (never a per-category window, which would put one
    category's full 20 TB in one partition); the global mean is a
    1-row broadcast. te is derived per-row from exact cent integers
    through the identical expression on both engines, so min/max —
    order-independent statistics — are bit-identical without rounding.
    """
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    cat_stats = t.groupBy("cat").agg(
        F.count("*").alias("n_c"), F.sum("y").alias("sum_c")
    )
    glob = t.agg((F.sum("y") * 1.0 / F.count("*")).alias("g"))
    te = (F.col("sum_c") - F.col("y") + 10 * F.col("g")) / (
        F.col("n_c") - 1 + 10
    )
    enc = (
        t.join(F.broadcast(cat_stats), "cat")
        .crossJoin(F.broadcast(glob))
        .select("cat", te.alias("te"))
    )
    return (
        enc.groupBy("cat")
        .agg(
            F.count("*").alias("n"),
            F.min("te").alias("te_min"),
            F.max("te").alias("te_max"),
        )
        .orderBy("cat")
    )


@register(
    "l_quantile_binning",
    oracle="""
WITH t AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
grain AS (
  SELECT cents, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY cents
),
cum AS (
  SELECT cents, n,
    sum(n) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS cumn,
    sum(n) OVER () AS tot
  FROM grain
),
binned AS (
  SELECT cents, n, CAST((cumn * 4 + tot - 1) // tot AS BIGINT) AS bin FROM cum
)
SELECT bin,
  CAST(sum(n) AS BIGINT) AS n_rows,
  CAST(min(cents) AS BIGINT) AS min_cents,
  CAST(max(cents) AS BIGINT) AS max_cents
FROM binned GROUP BY bin ORDER BY bin
""",
    tags=("D5", "E3", "B6"),
)
def l_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quantile binning (4 bins) for feature
    discretization, with tie-coherence: all rows sharing a value land
    in the same bin (ntile would split ties arbitrarily across bins —
    a nondeterminism source AND a subtle train/serve skew, since
    serving maps a VALUE to a bin). bin = ceil(4·cum/total) in exact
    integer arithmetic.

    Scale shape: the prefix sum runs at DISTINCT-VALUE grain (the
    compressed series), not over raw rows — same pattern as
    d_weighted_median. A 100 TB column with 10M distinct values
    windows over 10M rows, not 10^12.
    """
    o = load_table(spark, sf_dir, "orders")
    grain = (
        o.select(F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"))
        .groupBy("cents")
        .agg(F.count("*").alias("n"))
    )
    cum = grain.select(
        "cents",
        "n",
        F.sum("n").over(W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)).alias("cumn"),
        F.sum("n").over(W.partitionBy()).alias("tot"),
    )
    binned = cum.select(
        "cents", "n", F.expr("(cumn * 4 + tot - 1) div tot").alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.sum("n").alias("n_rows"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("bin")
    )


@register(
    "l_grouped_split",
    oracle="""
WITH hashed AS (
  SELECT user_id, event_id,
    (
      (ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
        - CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) >= 97 THEN 87 ELSE 48 END) * 4096
      + (ascii(substr(md5(CAST(user_id AS VARCHAR)), 2, 1))
        - CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) >= 97 THEN 87 ELSE 48 END) * 256
      + (ascii(substr(md5(CAST(user_id AS VARCHAR)), 3, 1))
        - CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 3, 1)) >= 97 THEN 87 ELSE 48 END) * 16
      + (ascii(substr(md5(CAST(user_id AS VARCHAR)), 4, 1))
        - CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 4, 1)) >= 97 THEN 87 ELSE 48 END)
    ) % 100 AS bucket
  FROM events
),
labeled AS (
  SELECT user_id, event_id,
         CASE WHEN bucket < 80 THEN 'train' ELSE 'test' END AS split
  FROM hashed
),
leak AS (
  SELECT CAST(count(*) AS BIGINT) AS n_leaky_users FROM (
    SELECT user_id FROM labeled GROUP BY user_id
    HAVING count(DISTINCT split) > 1
  )
)
SELECT split,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(count(*) AS BIGINT)                AS n_rows,
  (SELECT n_leaky_users FROM leak)        AS n_leaky_users
FROM labeled GROUP BY split ORDER BY split
""",
    tags=("H4", "G3", "F2"),
)
def l_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GROUPED train/test split: the split key is a hash
    of user_id, so every event of a user lands in the same split — the
    partition discipline that prevents user-level leakage between
    train and eval (a row-level random split leaks user behavior
    across the boundary). 80/20 by md5 bucket; seedless, stable across
    runs, engines, and re-partitioning.

    The bucket derives from the first 4 hex chars of md5 via explicit
    ascii arithmetic because that's the one hash both engines compute
    identically (Spark xxhash64 has no DuckDB twin). The leakage audit
    (users with >1 distinct split — structurally 0, but MEASURED) is
    the point: it's the check a pipeline runs after any split logic
    change.
    """
    e = load_table(spark, sf_dir, "events")
    h = F.md5(F.col("user_id").cast("string"))

    def hexdigit(i: int):
        a = F.ascii(F.substring(h, i, 1))
        return a - F.when(a >= 97, 87).otherwise(48)

    bucket = (
        hexdigit(1) * 4096 + hexdigit(2) * 256 + hexdigit(3) * 16 + hexdigit(4)
    ) % 100
    labeled = e.select(
        "user_id",
        "event_id",
        F.when(bucket < 80, "train").otherwise("test").alias("split"),
    )
    leak = (
        labeled.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count("*").alias("n_leaky_users"))
    )
    return (
        labeled.groupBy("split")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_rows"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_users", "n_rows", "n_leaky_users")
        .orderBy("split")
    )


@register(
    "d_partial_agg_merge",
    oracle="""
WITH t AS (
  SELECT l_orderkey % 2 AS shard, l_returnflag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
partials AS (
  SELECT shard, l_returnflag,
    CAST(count(*) AS BIGINT)                   AS n,
    CAST(sum(cents) AS BIGINT)                 AS s,
    CAST(min(cents) AS BIGINT)                 AS lo,
    CAST(max(cents) AS BIGINT)                 AS hi,
    sum(CAST(cents AS HUGEINT) * cents)        AS ss
  FROM t GROUP BY shard, l_returnflag
),
merged AS (
  SELECT l_returnflag,
    CAST(sum(n) AS BIGINT)  AS n,
    CAST(sum(s) AS BIGINT)  AS sum_cents,
    CAST(min(lo) AS BIGINT) AS min_cents,
    CAST(max(hi) AS BIGINT) AS max_cents,
    CAST(sum(ss) AS DOUBLE) AS sumsq
  FROM partials GROUP BY l_returnflag
)
SELECT l_returnflag, n, sum_cents, min_cents, max_cents,
  sumsq / n - (sum_cents * 1.0 / n) * (sum_cents * 1.0 / n) AS var_pop_cents2
FROM merged ORDER BY l_returnflag
""",
    tags=("D1", "D8"),
)
def d_partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable aggregation made explicit: shard-local
    partial states (count, sum, min, max, sum-of-squares) merged into
    finals by pure state algebra — the exact contract behind Spark's
    partial_/final HashAggregate split and any incremental pipeline
    that persists partial aggregates between runs. Population variance
    is DERIVED from merged exact states (ss/n − mean²), never
    recomputed from raw rows.

    Sum-of-squares overflows bigint at scale (1e14 per row × 6e5
    rows), so it accumulates in decimal(38,0) (Spark) / HUGEINT
    (DuckDB) — both exact — and only the final cast goes to double.
    var_pop_cents2 is identical-by-construction: same exact integers
    through the same expression, left unrounded.
    """
    l = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    t = l.select(
        (F.col("l_orderkey") % 2).alias("shard"),
        "l_returnflag",
        cents.alias("cents"),
    )
    partials = t.groupBy("shard", "l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("s"),
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")
        ).alias("ss"),
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("sum_cents"),
        F.min("lo").alias("min_cents"),
        F.max("hi").alias("max_cents"),
        F.sum("ss").cast("double").alias("sumsq"),
    )
    mean = F.col("sum_cents") * 1.0 / F.col("n")
    return merged.select(
        "l_returnflag",
        "n",
        "sum_cents",
        "min_cents",
        "max_cents",
        (F.col("sumsq") / F.col("n") - mean * mean).alias("var_pop_cents2"),
    ).orderBy("l_returnflag")
