"""Round-3 widening batch 15: graph analytics (integer-exact PageRank
over the nation trade graph), in-flight data-quality metrics via the
Observation/observe API (zero extra scans), and Spark 4 parameterized
SQL with DataFrame template binding.

House rules (registry.py): identical aliases both sides; the PageRank
iteration runs in scaled INTEGER units with floor division so ten
iterations stay bit-exact on both engines (double mass updates would
amplify ulp drift across iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.localrel import local_df
from parking_violations_data_pipeline_spark.registry import register

_PR_ITERS = 10


def _pagerank_oracle() -> str:
    """Unrolled 10-iteration integer PageRank: the recursive term
    needs aggregation (banned/fragile inside RECURSIVE CTEs), so the
    oracle chains pr0..pr10 explicitly — same algebra as the Spark
    loop, iteration by iteration."""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(f"""
pr{i + 1} AS (
  SELECT n.nation,
    150000 + (85 * coalesce(c.contrib, 0)) // 100 AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS nation,
           CAST(sum((p.r * e.w) // e.out_w) AS BIGINT) AS contrib
    FROM edges e JOIN pr{i} p ON p.nation = e.src
    GROUP BY e.dst
  ) c ON c.nation = n.nation
)""")
    return f"""
WITH rev AS (
  SELECT ns.n_name AS src, nc.n_name AS dst,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  GROUP BY ns.n_name, nc.n_name
),
edges_raw AS (
  SELECT src, dst, cents // 100000 AS w FROM rev WHERE cents // 100000 > 0
),
out_tot AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM edges_raw GROUP BY src
),
edges AS (
  SELECT e.src, e.dst, e.w, o.out_w FROM edges_raw e JOIN out_tot o ON e.src = o.src
),
nodes AS (
  SELECT src AS nation FROM edges_raw UNION SELECT dst FROM edges_raw
),
pr0 AS (
  SELECT nation, CAST(1000000 AS BIGINT) AS r FROM nodes
),{",".join(steps)}
SELECT nation, CAST(r AS BIGINT) AS rank_micro
FROM pr{_PR_ITERS} ORDER BY rank_micro DESC, nation
"""


@register("q_trade_pagerank", oracle=_pagerank_oracle(), tags=("C1", "D1", "J10"))
def q_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade graph (supplier nation →
    customer nation, edge weight = revenue): which markets sit at the
    center of the flow network. The expensive, scale-bound stage is
    building the edge list — a 5-way join aggregated to nation² grain
    (625 rows max); the iteration then runs over a graph whose size is
    bounded by geography, not data volume, with each step one
    broadcast join + aggregation.

    Determinism across 10 iterations: ranks live in integer
    micro-units with floor-division transitions (contrib = r·w //
    out_w; damping = 150000 + 85·Σ//100), so every iteration is
    bit-exact on both engines — a double formulation would compound
    summation-order ulps per iteration. Simplified PR (dangling mass
    not redistributed), identical on both sides.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(maybe_broadcast(s, sf_dir, "supplier"), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst"))),
            c.c_nationkey == F.col("ck"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src"))),
            s.s_nationkey == F.col("sk"),
        )
        .groupBy("src", "dst")
        .agg(F.sum(cents).alias("cents"))
    )
    edges_raw = rev.select(
        "src", "dst", F.expr("cents div 100000").alias("w")
    ).filter(F.col("w") > 0)
    out_tot = edges_raw.groupBy("src").agg(F.sum("w").alias("out_w"))
    # Materialize the graph to LOCAL relations: bounded by SCHEMA
    # (nation x nation edges, 25 nations at every SF → ≤ 600 edge
    # rows / 25 node rows even at 100 TB), so one Spark job + a
    # driver-side rebuild replaces the previous persist() pair, which
    # left pinned storage blocks behind for the session lifetime (a
    # 477-entry session accumulated enough retained blocks to starve a
    # later sort of execution memory). The power-iteration loop now
    # joins against broadcast-sized local relations.
    edges_dist = edges_raw.join(out_tot, "src")
    erows = edges_dist.collect()
    # node set derives from the already-collected edges (the out_tot
    # join is inner on src but drops nothing: every src appears in
    # out_tot by construction) — no second scan of the fact tables.
    #
    # Round-11 optimization (guide §1.2): the power iteration itself
    # runs DRIVER-SIDE over the collected edges. The previous form
    # left the loop as a lazily-built 10-level join/agg tree over
    # 32-partition local relations — one noop action then executed
    # ~30 shuffled stages (7.2 s Spark-only at sf0.01) to iterate a
    # graph bounded by SCHEMA at ≤600 edge rows. Python integer
    # arithmetic reproduces the exact same floor-division recurrence
    # (all values positive, so SQL `div` == Python `//`), so the
    # result is bit-identical; only the final ranking frame touches
    # Spark.
    names = sorted({r["src"] for r in erows} | {r["dst"] for r in erows})
    rank = {x: 1_000_000 for x in names}
    for _ in range(_PR_ITERS):
        contrib: dict[str, int] = {}
        for r in erows:
            c = (rank[r["src"]] * r["w"]) // r["out_w"]
            contrib[r["dst"]] = contrib.get(r["dst"], 0) + c
        rank = {x: 150_000 + (85 * contrib.get(x, 0)) // 100 for x in names}
    pr = local_df(
        spark, [(x, rank[x]) for x in names], "nation string, r long"
    )
    return pr.select(
        "nation", F.col("r").alias("rank_micro")
    ).orderBy(F.col("rank_micro").desc(), "nation")


@register(
    "etl_inflight_observe",
    oracle="""
SELECT
  CAST(count(*) AS BIGINT)                                       AS n_rows,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                                                                 AS sum_cents,
  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                                                                 AS n_bad_qty,
  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                                                                 AS n_bad_discount
FROM lineitem
""",
    tags=("A5", "B5", "D1"),
)
def etl_inflight_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight data-quality metrics via `DataFrame.observe` + the
    `Observation` helper: the DQ counters (row count, money total,
    nonpositive quantities, out-of-range discounts) are computed
    AS the data flows through an action — zero additional scans, which
    at 100 TB is the difference between free monitoring and doubling
    the job. This is the batch twin of streaming's observe/metrics
    listener.

    The observed metrics surface driver-side after the action; the
    query re-emits them as a one-row DataFrame so the driver protocol
    can hash them against the oracle's second-scan recomputation —
    proving the in-flight numbers equal the ground truth.
    """
    from pyspark.sql import Observation

    l = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    obs = Observation("dq")
    observed = l.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("n_bad_qty"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5), 1
            ).otherwise(0)
        ).alias("n_bad_discount"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get

    def _i(x):  # sums observe as NULL on an empty flow — keep them NULL
        return int(x) if x is not None else None

    return spark.createDataFrame(
        [
            (
                _i(m["n_rows"]),
                _i(m["sum_cents"]),
                _i(m["n_bad_qty"]),
                _i(m["n_bad_discount"]),
            )
        ],
        "n_rows bigint, sum_cents bigint, n_bad_qty bigint, n_bad_discount bigint",
    )


@register(
    "h_sql_parameters",
    oracle="""
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_totalprice > 200000 AND o_orderstatus = 'O'
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("B3", "D1"),
)
def h_sql_parameters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 parameterized SQL: named scalar parameters (`:thr`,
    `:status`) bound server-side — injection-safe, plan-cache-friendly
    — plus DataFrame template binding (`{orders}` interpolates a
    DataFrame into the query without registering a temp view). The
    pair replaces f-string SQL assembly, the classic source of both
    injection bugs and accidental plan-cache misses.
    """
    o = load_table(spark, sf_dir, "orders")
    return spark.sql(
        """
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM {orders}
WHERE o_totalprice > :thr AND o_orderstatus = :status
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        args={"thr": 200000, "status": "O"},
        orders=o,
    )
