"""Round-4 widening batch 73: distributed triangle counting over the
co-purchase graph (degree-ordered orientation — the algorithm that
survives power-law degree skew at scale), record-breaking event
detection (running-max census), and rank-exact trimmed mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.functions.timeutil import epoch_us
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_triangle_count",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT a AS node FROM pairs UNION ALL SELECT b AS node FROM pairs
  ) GROUP BY node
),
ord AS (
  SELECT node, row_number() OVER (ORDER BY d, node) AS o FROM deg
),
e AS (
  SELECT least(oa.o, ob.o) AS lo, greatest(oa.o, ob.o) AS hi
  FROM pairs JOIN ord oa ON pairs.a = oa.node
             JOIN ord ob ON pairs.b = ob.node
),
wedges AS (
  SELECT e1.hi AS v, e2.hi AS w
  FROM e e1 JOIN e e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
)
SELECT
  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
  CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
  CAST((SELECT count(*) FROM wedges) AS BIGINT) AS n_wedges,
  CAST((SELECT count(*) FROM wedges JOIN e
        ON wedges.v = e.lo AND wedges.w = e.hi) AS BIGINT) AS n_triangles
""",
    tags=("C1", "J9", "D1"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting on the part co-purchase graph
    (edge = two parts appear in the same order). Scale design: the
    pair expansion is bounded per order (TPC-H ≤ 7 lines/order, so
    O(rows) not O(rows²)); edges are then ORIENTED low→high by the
    total order (degree, node) — every wedge is enumerated only at its
    lowest-degree apex, which caps the join fan-out at the graph's
    arboricity instead of its max degree (the classic compact-forward
    guarantee; a celebrity node with degree 10⁶ contributes wedges
    only through its low-degree neighbors). Closing edges found by one
    equi-join. All joins shuffle on integer keys; no driver-side
    state.

    Round-11 (guide §3.3 "materialising an intermediate truncates the
    plan"): the four summary scalars share the pair/edge lineage, and
    Catalyst does not dedupe common subtrees across the crossJoined
    aggregates — the initial physical plan replicated the
    lineitem-self-join-distinct ~20x (174 Exchanges / 128 scans, zero
    ReusedExchange). `pairs` and the oriented edge list `e` are now
    localCheckpointed once — the standard triangle-counting shape
    (materialize the edge list, then join against it); every
    downstream consumer reads the materialized blocks. Counts are
    unchanged by construction (same relations, truncated lineage).

    Caveats of localCheckpoint (round-11 ADVICE, documented contract):
    it is EAGER — building this DataFrame executes the self-join/
    distinct at plan-construction time — and DISK_ONLY local-checkpoint
    blocks are non-recoverable on executor loss (the job fails instead
    of recomputing lineage). Acceptable for the single-JVM gate
    harness; a multi-executor deployment should swap in reliable
    checkpointing (sc.setCheckpointDir + .checkpoint()) at the same two
    call sites.

    Round-12 (guide §2.4, VERDICT r11 item 3): edge orientation no
    longer assigns a global dense rank via row_number() OVER (ORDER BY
    d, node) — a partition-less window is a single-partition global
    sort, the one serial stage in the query at scale. Edges are now
    oriented by comparing (d, node) structs directly (least/greatest;
    Spark orders structs lexicographically), which is the same total
    order the rank encoded, so every downstream comparison (wedge
    hi<hi, closing-edge equality) and therefore every count is
    identical — rank labels were order-isomorphic to the structs they
    ranked. Wedge/closing joins now key on the structs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    pairs = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_partkey") < F.col("l2.l_partkey")),
        )
        .select(F.col("l1.l_partkey").alias("a"), F.col("l2.l_partkey").alias("b"))
        .distinct()
        # DISK_ONLY: the driver-faithful gate session runs a default
        # (1g) heap; deserialized MEMORY_AND_DISK blocks for the pair
        # set plus the wedge join OOM it at sf0.1. Disk blocks are
        # read back columnar-cheap and are still ~20x cheaper than
        # re-executing the self-join lineage per consumer.
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    e = (
        pairs.join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.least(F.struct(F.col("da").alias("d"), F.col("a").alias("n")),
                    F.struct(F.col("db").alias("d"), F.col("b").alias("n"))).alias("lo"),
            F.greatest(F.struct(F.col("da").alias("d"), F.col("a").alias("n")),
                       F.struct(F.col("db").alias("d"), F.col("b").alias("n"))).alias("hi"),
        )
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.lo") == F.col("e2.lo")) & (F.col("e1.hi") < F.col("e2.hi")),
    ).select(F.col("e1.hi").alias("v"), F.col("e2.hi").alias("w"))
    closing = e.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).agg(F.count("*").alias("n_triangles"))
    summary = (
        e.agg(F.count("*").alias("n_edges"))
        .crossJoin(deg.agg(F.max("d").cast("bigint").alias("max_degree")))
        .crossJoin(wedges.agg(F.count("*").alias("n_wedges")))
        .crossJoin(tri)
    )
    return summary.select("n_edges", "max_degree", "n_wedges", "n_triangles")


@register(
    "e_record_breaks",
    oracle="""
WITH p AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
    CAST(round(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE value > 0 AND ts IS NOT NULL
),
r AS (
  SELECT event_type, us, cents,
    max(cents) OVER (PARTITION BY event_type ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS prior_max
  FROM p
)
SELECT event_type,
  CAST(count(*) FILTER (WHERE prior_max IS NULL OR cents > prior_max)
       AS BIGINT) AS n_records,
  CAST(max(CASE WHEN prior_max IS NULL OR cents > prior_max THEN cents END)
       AS BIGINT) AS top_record_cents,
  CAST(max(CASE WHEN prior_max IS NULL OR cents > prior_max THEN us END)
       AS BIGINT) AS last_record_us
FROM r GROUP BY event_type ORDER BY event_type
""",
    tags=("E3", "E2"),
)
def e_record_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking events: per event_type, how many events set a
    new all-time-high value at the moment they occurred (strictly
    above every prior event in (time, event_id) order), the highest
    record and when the last record fell. One running-max window with
    a 1-PRECEDING upper frame bound — the 'new high' test needs the
    max BEFORE the current row, not including it (ties must NOT count
    as records). Single shuffle on event_type."""
    # a record needs a moment in event time: NULL ts dropped both sides
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("value") > 0) & F.col("ts").isNotNull()
    )
    p = e.select(
        "event_type",
        epoch_us("ts").alias("us"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = p.withColumn("prior_max", F.max("cents").over(w))
    is_rec = F.col("prior_max").isNull() | (F.col("cents") > F.col("prior_max"))
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.when(is_rec, 1)).alias("n_records"),
            F.max(F.when(is_rec, F.col("cents"))).alias("top_record_cents"),
            F.max(F.when(is_rec, F.col("us"))).alias("last_record_us"),
        )
        .orderBy("event_type")
    )


@register(
    "d_trimmed_mean",
    oracle="""
WITH c AS (
  SELECT o_orderpriority AS pri,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
    o_orderkey
  FROM orders
),
r AS (
  SELECT pri, cents,
    row_number() OVER (PARTITION BY pri ORDER BY cents, o_orderkey) AS rn,
    count(*) OVER (PARTITION BY pri) AS n
  FROM c
)
SELECT pri,
  CAST(max(n) AS BIGINT) AS n_total,
  CAST(count(*) FILTER (WHERE rn > n // 10 AND rn <= n - n // 10)
       AS BIGINT) AS n_kept,
  CAST(sum(cents) FILTER (WHERE rn > n // 10 AND rn <= n - n // 10)
       AS BIGINT) AS sum_kept_cents,
  CAST((sum(cents) FILTER (WHERE rn > n // 10 AND rn <= n - n // 10)) * 1000
       // (count(*) FILTER (WHERE rn > n // 10 AND rn <= n - n // 10))
       AS BIGINT) AS trimmed_mean_millicents
FROM r GROUP BY pri ORDER BY pri
""",
    tags=("D5", "E1"),
)
def d_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed mean of order value per priority — the robust
    location estimate that survives fat tails without winsorize's
    value substitution. Rank-exact: drop the lowest and highest
    n//10 rows by (cents, orderkey) full-key order, then integer
    sum/count; the mean is emitted in millicents via integer division
    so no double ever materializes cross-engine. One shuffle on the
    group key serves both the ranking window and the aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        "o_orderkey",
    )
    wp = Window.partitionBy("pri")
    r = o.select(
        "pri",
        "cents",
        F.row_number().over(wp.orderBy("cents", "o_orderkey")).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    kept = F.col("rn").between(F.expr("n div 10 + 1"), F.expr("n - n div 10"))
    return (
        r.groupBy("pri")
        .agg(
            F.max("n").alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.sum(F.when(kept, F.col("cents"))).alias("sum_kept_cents"),
            F.expr(
                "sum(CASE WHEN rn > n div 10 AND rn <= n - n div 10 THEN cents END)"
                " * 1000 div "
                "count(CASE WHEN rn > n div 10 AND rn <= n - n div 10 THEN 1 END)"
            ).alias("trimmed_mean_millicents"),
        )
        .orderBy("pri")
    )
