"""Round-3 widening batch 18: bitmap-backed exact distinct counting
(the mergeable dense alternative to HLL), the batch `session_window`
function proven against manual islands sessionization, and sequential
per-key FOLDS (EWMA, clamped running balance) expressed as
higher-order array reductions in exact integer arithmetic.

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, integer-exact payloads for anything
iterative, total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "h_bitmap_distinct",
    oracle="""
SELECT l_returnflag,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("D2", "D3", "H3"),
)
def h_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates
    (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count — Spark 3.5+): each 32k-id
    bucket becomes one dense bitmap, buckets merge by OR, and the
    final count sums per-bucket popcounts. Unlike count(DISTINCT) the
    intermediate state is MERGEABLE (pre-aggregate per partition,
    union later — the same contract as d_partial_agg_merge), and
    unlike HLL it is exact; the cost model is id-density, which is
    why it's the warehouse pattern for dense surrogate keys.

    The oracle recomputes with plain COUNT(DISTINCT): bit-identical
    results prove the bitmap path drops nothing.
    """
    l = load_table(spark, sf_dir, "lineitem")

    def bitmap_distinct(key: str, out: str) -> DataFrame:
        per_bucket = (
            l.groupBy(
                "l_returnflag",
                F.bitmap_bucket_number(F.col(key)).alias("bucket"),
            )
            .agg(
                F.bitmap_construct_agg(F.bitmap_bit_position(F.col(key))).alias("bm")
            )
        )
        return per_bucket.groupBy("l_returnflag").agg(
            F.sum(F.bitmap_count("bm")).alias(out)
        )

    parts = bitmap_distinct("l_partkey", "n_parts")
    supps = bitmap_distinct("l_suppkey", "n_supps")
    # null-safe equality: a NULL returnflag group must survive the
    # two-branch join exactly like SQL GROUP BY keeps it
    return (
        parts.join(
            supps,
            parts["l_returnflag"].eqNullSafe(supps["l_returnflag"]),
        )
        .select(parts["l_returnflag"], "n_parts", "n_supps")
        .orderBy("l_returnflag")
    )


@register(
    "q_session_window_fn",
    oracle="""
WITH e AS (
  -- session_window drops NULL-timestamp rows (no window assignable);
  -- the manual-islands oracle mirrors that explicitly
  SELECT user_id, epoch_us(ts) AS us FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT user_id, us,
    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
         OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
    THEN 1 ELSE 0 END AS brk
  FROM e
),
sess AS (
  SELECT user_id, us,
    sum(brk) OVER (PARTITION BY user_id ORDER BY us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
         (max(us) - min(us)) // 1000000 AS span_s
  FROM sess GROUP BY user_id, sid
)
SELECT
  CAST(count(*) AS BIGINT)      AS n_sessions,
  CAST(sum(n_events) AS BIGINT) AS n_events,
  CAST(max(span_s) AS BIGINT)   AS max_span_s,
  CAST(sum(span_s) AS BIGINT)   AS sum_span_s
FROM per
""",
    tags=("I4", "E2", "D1"),
)
def q_session_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BATCH `session_window` function (the same gap-session
    operator Structured Streaming uses, applied to a static frame):
    groupBy(session_window(ts, '30 minutes'), user_id) merges
    overlapping per-event windows into gap-closed sessions inside the
    aggregation operator itself — no lag/flag/prefix-sum scaffolding.

    The oracle IS the manual islands sessionization (q_sessionize's
    algebra), so a green row proves the engine's built-in session
    semantics match the hand-built one exactly: same session count,
    same event totals, same spans (session_window's end includes the
    +30 min gap padding, so spans subtract it via last-event minus
    first-event within the window).
    """
    e = load_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), "30 minutes")
    per = e.groupBy(sw.alias("sw"), "user_id").agg(
        F.count("*").alias("n_events"),
        (
            (epoch_us(F.max("ts")) - epoch_us(F.min("ts")))
            / 1_000_000
        )
        .cast("long")
        .alias("span_s"),
    )
    return per.agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("span_s").alias("max_span_s"),
        F.sum("span_s").alias("sum_span_s"),
    )


@register(
    "e_ewma_fold",
    oracle="""
WITH p AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(round(value * 10000) AS BIGINT) AS units
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
folded AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n,
    CAST(list_reduce(
      list_prepend(0, list(units ORDER BY us, event_id)),
      (acc, x) -> (x + acc) // 2
    ) AS BIGINT) AS ewma_units
  FROM p GROUP BY user_id
)
SELECT user_id, n, ewma_units FROM folded ORDER BY user_id
""",
    tags=("E3", "H5", "K2"),
)
def e_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) per user — a
    RECURSIVE statistic (sᵢ = (xᵢ + sᵢ₋₁) div 2) that no window frame
    expresses. The scalable rewrite: gather each key's ordered series
    into an array (bounded by per-key cardinality, not corpus) and run
    the recursion as a higher-order `aggregate` fold — JVM-side,
    zero Python, and exactly the shape `applyInPandas` would take over
    keys too large for one array. Integer micro-units with floor
    division keep all iteration states bit-exact on both engines
    (DuckDB folds the same list with list_reduce).

    (x + acc)/2 stays below 2⁵³, so the float floor is exact and
    equals the oracle's integer //.
    """
    # the fold's order key is event time: NULL ts dropped both sides
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    )
    p = e.select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        "event_id",
        F.round(F.col("value") * 10000, 0).cast("long").alias("units"),
    )
    series = p.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("us", "event_id", "units"))),
            lambda s: s["units"],
        ).alias("xs"),
    )
    fold = F.aggregate(
        "xs",
        F.lit(0).cast("long"),
        lambda acc, x: F.floor((x + acc) / 2).cast("long"),
    )
    return series.select(
        "user_id", "n", fold.alias("ewma_units")
    ).orderBy("user_id")


@register(
    "q_clamped_balance_fold",
    oracle="""
WITH mv AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
    CASE WHEN event_type = 'purchase'
         THEN CAST(round(value * 100) AS BIGINT)
         ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
  FROM events WHERE event_type IN ('purchase', 'error')
),
folded AS (
  SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_moves,
    CAST(list_reduce(
      list_prepend(0, list(delta ORDER BY us, event_id)),
      (acc, x) -> CASE WHEN acc + x > 0 THEN acc + x ELSE 0 END
    ) AS BIGINT) AS final_balance_cents
  FROM mv GROUP BY user_id
)
SELECT user_id, n_moves, final_balance_cents FROM folded ORDER BY user_id
""",
    tags=("E3", "H5", "B6"),
)
def q_clamped_balance_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance with a floor-at-zero clamp (inventory /
    prepaid-credit semantics: you can't go negative, and the clamp
    makes the recursion NONLINEAR — max(0, acc + x) — so unlike a
    plain running sum no prefix trick exists). Same fold machinery as
    e_ewma_fold: ordered per-key array + higher-order aggregate,
    integer cents, bit-exact on both engines.

    Purchases credit, errors debit; the fold result is each user's
    ending balance under clamping.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "error")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    mv = e.select(
        "user_id",
        epoch_us(F.col("ts")).alias("us"),
        "event_id",
        F.when(F.col("event_type") == "purchase", cents)
        .otherwise(-cents)
        .alias("delta"),
    )
    series = mv.groupBy("user_id").agg(
        F.count("*").alias("n_moves"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("us", "event_id", "delta"))),
            lambda s: s["delta"],
        ).alias("xs"),
    )
    fold = F.aggregate(
        "xs",
        F.lit(0).cast("long"),
        lambda acc, x: F.greatest(acc + x, F.lit(0).cast("long")),
    )
    return series.select(
        "user_id", "n_moves", fold.alias("final_balance_cents")
    ).orderBy("user_id")
