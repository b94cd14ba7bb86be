"""Round-3 widening batch 19: remaining aggregate/window engine
surface (boolean + bitwise aggregates, nth_value / ignore-nulls
positional windows) and two closed-form analytics composites
(association-rule lift mining, Herfindahl-Hirschman revenue
concentration) — all in exact integer arithmetic per the house
rounding rule (SURVEY §12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_bool_bit_aggs",
    oracle="""
SELECT l_returnflag,
  bool_and(l_quantity > 1)   AS all_multi,
  bool_or(l_discount > 0.09) AS any_deep_disc,
  CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS line_and,
  CAST(bit_or(CAST(l_linenumber AS BIGINT))  AS BIGINT) AS line_or,
  CAST(bit_xor(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS line_xor,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tags=("D1", "H3"),
)
def d_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/some — SQL bool_and/bool_or) and
    bitwise aggregates (bit_and / bit_or / bit_xor) — the last
    uncovered corner of the batch aggregate surface. Booleans are
    short-circuit-safe predicates over the group; the bit folds are
    associative+commutative (order-free, hence partial-aggregable
    map-side like any algebraic agg). bit_xor doubles as a cheap
    order-insensitive set checksum in reconciliation jobs.

    Exactness: inputs are small integers (l_linenumber 1..7) and exact
    predicates — no floating point anywhere, bit-identical by
    construction.
    """
    l = load_table(spark, sf_dir, "lineitem")
    ln = F.col("l_linenumber").cast("long")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.every(F.col("l_quantity") > 1).alias("all_multi"),
            F.some(F.col("l_discount") > 0.09).alias("any_deep_disc"),
            F.bit_and(ln).alias("line_and"),
            F.bit_or(ln).alias("line_or"),
            F.bit_xor(ln).alias("line_xor"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "e_nth_value_window",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
    CASE WHEN event_type = 'purchase'
         THEN CAST(round(value * 100, 0) AS BIGINT) END AS p_cents
  FROM events WHERE ts IS NOT NULL
),
ordered AS (
  SELECT user_id, p_cents,
    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn,
    CASE WHEN p_cents IS NOT NULL THEN
      row_number() OVER (PARTITION BY user_id, p_cents IS NOT NULL
                         ORDER BY us, event_id) END AS nn_rn
  FROM e
),
per_user AS (
  SELECT user_id,
    max(CASE WHEN rn = 2 THEN p_cents END)    AS second_cents,
    max(CASE WHEN rn = 3 THEN p_cents END)    AS third_cents,
    max(CASE WHEN nn_rn = 1 THEN p_cents END) AS first_nn_cents,
    max_by(p_cents, nn_rn) FILTER (WHERE nn_rn IS NOT NULL) AS last_nn_cents,
    CAST(count(*) AS BIGINT) AS n_events
  FROM ordered GROUP BY user_id
)
SELECT
  CAST(count(*) AS BIGINT)                          AS n_users,
  CAST(count(second_cents) AS BIGINT)               AS n_second,
  CAST(sum(second_cents) AS BIGINT)                 AS sum_second,
  CAST(sum(third_cents) AS BIGINT)                  AS sum_third,
  CAST(sum(first_nn_cents) AS BIGINT)               AS sum_first_nn,
  CAST(sum(last_nn_cents) AS BIGINT)                AS sum_last_nn,
  CAST(sum(n_events) AS BIGINT)                     AS n_events
FROM per_user
""",
    tags=("E2", "E3"),
)
def e_nth_value_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window functions: nth_value(·, 2|3) over the full
    partition frame, and first/last with ignoreNulls over a sparse
    (purchase-only) column — the "second touch value" / "latest known
    price" shapes. One user_id shuffle serves every window; the final
    global rollup keeps the output a single hashable row.

    The value column is NULL for every non-purchase event, so the
    ignore-nulls pair proves frame-wide null skipping, not just frame
    endpoints. Oracle reproduces nth-value as row_number + conditional
    max and ignore-nulls as a rank over the non-null subsequence.
    Ties on ts are broken by event_id on both sides (total order).
    """
    # positional windows need a total event-time order: NULL ts
    # dropped on both sides
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    p_cents = (
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("long"),
        )
    ).alias("p_cents")
    base = e.select("user_id", epoch_us("ts").alias("us"), "event_id", p_cents)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_cur = Window.partitionBy("user_id").orderBy("us", "event_id")
    per_event = base.select(
        "user_id",
        F.nth_value("p_cents", 2).over(w).alias("second_cents"),
        F.nth_value("p_cents", 3).over(w).alias("third_cents"),
        F.first("p_cents", ignorenulls=True).over(w).alias("first_nn_cents"),
        F.last("p_cents", ignorenulls=True).over(w).alias("last_nn_cents"),
        F.row_number().over(w_cur).alias("rn"),
        F.count("*").over(w).alias("n_events"),
    )
    per_user = per_event.filter(F.col("rn") == 1)
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("second_cents").alias("n_second"),
        F.sum("second_cents").alias("sum_second"),
        F.sum("third_cents").alias("sum_third"),
        F.sum("first_nn_cents").alias("sum_first_nn"),
        F.sum("last_nn_cents").alias("sum_last_nn"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "q_basket_lift",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n_orders AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM ob),
brand_n AS (SELECT brand, CAST(count(*) AS BIGINT) AS n_b FROM ob GROUP BY brand),
pair_n AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY a.brand, b.brand
)
SELECT brand_a, brand_b, n_ab,
  CAST(n_ab * 1000000 // na.n_b AS BIGINT)                    AS conf_ppm,
  CAST(n_ab * n_orders.n * 1000000 // (na.n_b * nb.n_b) AS BIGINT) AS lift_ppm
FROM pair_n
JOIN brand_n na ON pair_n.brand_a = na.brand
JOIN brand_n nb ON pair_n.brand_b = nb.brand
CROSS JOIN n_orders
ORDER BY lift_ppm DESC, brand_a, brand_b LIMIT 15
""",
    tags=("C1", "D1", "F3"),
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining metrics over brand co-occurrence:
    support counts, confidence, and lift per brand pair. The pair
    blow-up is bounded per order (≤7 lineitems → ≤21 pairs), so the
    self-join on l_orderkey is linear in orders, never corpus²; the
    per-brand totals (≤25 rows) and the global order count broadcast
    back onto the pair table.

    Ratios live in integer ppm with floor division (n_ab·10⁶ // n_a)
    — engine-exact, no double rounding — and the top-15 is totally
    ordered by (lift_ppm, brand_a, brand_b).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ob = (
        l.join(maybe_broadcast(p.select("p_partkey", "p_brand"), sf_dir, "part"), l.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_orders = ob.select(F.countDistinct("okey").alias("n"))
    brand_n = ob.groupBy("brand").agg(F.count("*").alias("n_b"))
    a = ob.alias("a")
    b = ob.alias("b")
    pair_n = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.brand") < F.col("b.brand")))
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    return (
        pair_n.join(
            F.broadcast(brand_n.select(F.col("brand").alias("brand_a"), F.col("n_b").alias("na"))),
            "brand_a",
        )
        .join(
            F.broadcast(brand_n.select(F.col("brand").alias("brand_b"), F.col("n_b").alias("nb"))),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.expr("n_ab * 1000000 div na").alias("conf_ppm"),
            F.expr("n_ab * n * 1000000 div (na * nb)").alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "brand_a", "brand_b")
        .limit(15)
    )


@register(
    "d_hhi_concentration",
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation, s.s_suppkey AS supp,
    CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, s.s_suppkey
),
tot AS (
  SELECT nation, CAST(sum(cents) AS BIGINT) AS tot_cents,
         CAST(count(*) AS BIGINT) AS n_supps
  FROM rev GROUP BY nation
),
shares AS (
  -- double-floor, mirroring the engine: int64 `cents * 1000000`
  -- overflows at ~$92B per (nation,supplier); the three IEEE double
  -- ops are bit-identical cross-engine at any magnitude
  SELECT rev.nation,
    CAST(floor(CAST(cents AS DOUBLE) * 1000000.0 / CAST(tot_cents AS DOUBLE)) AS BIGINT) AS share_ppm
  FROM rev JOIN tot ON rev.nation = tot.nation
)
SELECT shares.nation,
  t.n_supps,
  CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
FROM shares JOIN tot t ON shares.nation = t.nation
GROUP BY shares.nation, t.n_supps
ORDER BY hhi_ppm DESC, shares.nation
""",
    tags=("D1", "C1"),
)
def d_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index per nation:
    supplier revenue shares squared and summed — the antitrust /
    vendor-risk screen. Two-level aggregation reuses one shuffle
    (supplier grain groups by nation prefix); shares live in integer
    ppm with floor division so Σshare² is bit-exact on both engines
    (a double Σ of 400 squares would flap on summation order).
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    rev = (
        l.join(maybe_broadcast(s.select("s_suppkey", "s_nationkey"), sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("s_suppkey").alias("supp"))
        .agg(F.sum(cents).alias("cents"))
    )
    tot = rev.groupBy("nation").agg(
        F.sum("cents").alias("tot_cents"), F.count("*").alias("n_supps")
    )
    # share in ppm via double-floor, NOT `cents * 1000000 div tot_cents`:
    # the int64 product overflows once a (nation,supplier) exceeds
    # ~$92B revenue (cents > 2^63/1e6 — reachable at 100-TB scale; the
    # extremes fixture caught it). floor(double·1e6/double) is the same
    # three IEEE ops on both engines, so it stays bit-identical
    # cross-engine at any magnitude and overflow-free to 1e308.
    shares = rev.join(F.broadcast(tot), "nation").select(
        "nation",
        "n_supps",
        F.floor(
            F.col("cents").cast("double") * 1000000.0
            / F.col("tot_cents").cast("double")
        ).alias("share_ppm"),
    )
    return (
        shares.groupBy("nation", "n_supps")
        .agg(
            F.expr("sum(share_ppm * share_ppm) div 1000000").alias("hhi_ppm"),
            F.max("share_ppm").alias("top_share_ppm"),
        )
        .select("nation", "n_supps", "hhi_ppm", "top_share_ppm")
        .orderBy(F.desc("hhi_ppm"), "nation")
    )
