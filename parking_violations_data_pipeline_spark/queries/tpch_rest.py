"""TPC-H completion: the last five classic shapes (Q2/Q11/Q12/Q20/Q21).

With this module the engine covers all 22 TPC-H query shapes (Q1-Q22),
each adapted to the driver fixture star schema (no partsupp table, no
commit/receipt dates, no shipmode/container columns — SURVEY.md §1.2):

  Q2   min-cost supplier: correlated min subquery -> per-part min
       join-back on exact integer cents (lineitem stands in for
       partsupp as the part<->supplier price relation)
  Q11  important stock: per-part value vs a scalar fraction of the
       grand total, compared in exact integer units
  Q12  late-line priority split: lateness derived from
       l_shipdate - o_orderdate (no receiptdate), l_returnflag stands
       in for the absent shipmode dimension
  Q20  dominant suppliers of one part family: nested per-(supp,part) /
       per-part aggregates with an exact integer share compare
  Q21  suppliers who kept orders waiting: EXISTS + NOT EXISTS self
       references -> semi + anti joins with a same-order/other-supplier
       compound condition

Money/threshold convention as in tpch_extra.py: every cross-engine
equality or inequality compare runs on exact int64/decimal integers
(cents, quantity units), never on divided doubles, so boundary rows
cannot flip between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
), cand AS (
  SELECT p.p_partkey, e.s_suppkey, e.s_name, e.s_acctbal, e.n_name, sp.cost_cents
  FROM part p
  JOIN supply sp ON sp.l_partkey = p.p_partkey
  JOIN eu e ON e.s_suppkey = sp.l_suppkey
  WHERE p.p_type = 'SMALL' AND p.p_size BETWEEN 10 AND 15
), mn AS (
  SELECT p_partkey, min(cost_cents) AS min_cents FROM cand GROUP BY p_partkey
)
SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey,
       CAST(c.cost_cents / 100.0 AS DOUBLE) AS supply_cost
FROM cand c JOIN mn ON mn.p_partkey = c.p_partkey AND c.cost_cents = mn.min_cents
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
""",
    tags=("C1", "C3", "D1", "F1"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: lineitem is the part<->supplier price
    relation; supply cost = cheapest observed line price in exact
    cents): for each SMALL mid-size part, the EUROPE supplier(s)
    matching the part's minimum cost.

    The correlated min subquery decorrelates into a per-part min
    aggregate joined back on integer-cents equality — the min-tie set
    is engine-identical by construction. The supplier dimension
    (region-filtered, 2 joins over ~100 rows) broadcasts; the only
    big shuffle is the per-(part,supplier) min over lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "SMALL") & F.col("p_size").between(10, 15))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cost_cents"
            )
        )
    )
    cand = supply.join(maybe_broadcast(eu, sf_dir, "supplier"), supply.l_suppkey == eu.s_suppkey).select(
        F.col("l_partkey").alias("p_partkey"),
        "s_name",
        "s_acctbal",
        "n_name",
        "cost_cents",
    )
    mn = cand.groupBy(F.col("p_partkey").alias("mn_key")).agg(
        F.min("cost_cents").alias("min_cents")
    )
    return (
        cand.join(
            maybe_broadcast(mn, sf_dir, "part"),
            (cand.p_partkey == mn.mn_key) & (cand.cost_cents == mn.min_cents),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.col("cost_cents") / 100.0).cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@register(
    "q11_important_stock",
    oracle="""
WITH v AS (
  SELECT l.l_partkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS units
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
  GROUP BY l.l_partkey
)
SELECT v.l_partkey AS p_partkey,
       CAST(round(v.units / 100.0, 2) AS DOUBLE) AS part_value
FROM v, (SELECT sum(units) AS tot, count(*) AS np FROM v) t
WHERE v.units * t.np > 2 * t.tot
ORDER BY part_value DESC, p_partkey
""",
    tags=("C1", "C3", "D1", "B3"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: stock value = total line revenue from
    the nation group's suppliers; no partsupp availqty): parts whose
    value exceeds twice the mean part value.

    The scalar-subquery threshold is a 1-row broadcast cross join and
    the compare runs as `units*np > 2*tot` in exact integers — no
    double fraction, so the boundary part set matches DuckDB exactly,
    and the 2×-mean form is scale-free (a fixed 1/N fraction empties
    the result as the part count grows — TPC-H itself scales the
    fraction by 1/SF for the same reason). One shuffle (per-part agg);
    the global total re-aggregates the per-part result, not the fact
    table. The int64 units sum is widened to decimal before the ×np
    product so the compare can't overflow at extreme corpus scale.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_7", "NATION_12")
    )
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    v = (
        li.join(maybe_broadcast(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("units")
        )
    )
    tot = v.agg(F.sum("units").alias("tot"), F.count("*").alias("np"))
    return (
        v.join(F.broadcast(tot))
        .filter(
            F.col("units").cast("decimal(38,0)") * F.col("np")
            > 2 * F.col("tot").cast("decimal(38,0)")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("units") / 100.0, 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q12_late_lines_priority",
    oracle="""
SELECT l.l_returnflag,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag IN ('R', 'A')
  AND l.l_shipdate >= o.o_orderdate + INTERVAL 80 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    tags=("C1", "B6", "D1", "F1"),
)
def q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: l_returnflag stands in for the absent
    shipmode; late = shipped ≥80 days after order date, replacing the
    receipt/commit-date chain): per flag, how many late lines belong
    to high- vs low-priority orders.

    The cross-table lateness predicate evaluates post-join (Catalyst
    still pushes the flag IN-list and shipdate window to the lineitem
    scan). The priority split is the classic conditional-sum pair over
    a 2-group agg — one shuffle of 2 rows after partial aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q20_dominant_suppliers",
    oracle="""
WITH gl AS (
  SELECT l.l_partkey, l.l_suppkey, CAST(sum(l.l_quantity) AS BIGINT) AS supp_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%blue%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
), pt AS (
  SELECT l_partkey, sum(supp_qty) AS part_qty FROM gl GROUP BY l_partkey
), dom AS (
  SELECT DISTINCT gl.l_suppkey
  FROM gl JOIN pt ON pt.l_partkey = gl.l_partkey
  WHERE gl.supp_qty * 2 > pt.part_qty
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN dom ON dom.l_suppkey = s.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY s.s_name
""",
    tags=("C1", "C4", "D1", "F1"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp availqty — "excess stock"
    becomes majority share of a part's 1996 shipments): suppliers who
    shipped more than half of some '%blue%' part's yearly volume.

    The nested-subquery chain becomes two stacked aggregates (per
    (part,supp), then per part) and a semi-join-shaped DISTINCT; the
    share compare `supp_qty*2 > part_qty` is exact (quantities are
    integral). The part filter broadcasts into the fact scan; the
    second agg runs over the already-tiny first-agg output.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    gl = (
        li.join(maybe_broadcast(p, sf_dir, "part"), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("supp_qty"))
    )
    pt = gl.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dom = (
        gl.join(maybe_broadcast(pt, sf_dir, "part"), gl.l_partkey == pt.pt_key)
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(maybe_broadcast(dom, sf_dir, "supplier"), s.s_suppkey == dom.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
WITH fl AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.l_shipdate >= o.o_orderdate + INTERVAL 80 DAY) AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, count(*) AS numwait
FROM fl l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM fl l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM fl l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.late)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
    tags=("C4", "C5", "D1", "F3"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: late = shipped ≥80 days after order
    date on finished orders): suppliers who were the SOLE late supplier
    on multi-supplier orders, ranked by how often.

    The EXISTS/NOT EXISTS pair over the same derived table becomes a
    left-semi then left-anti join, each on orderkey equality plus the
    supplier-inequality residual. The derived late-flag relation is
    computed once and reused for all three roles; only
    (orderkey, suppkey, late) shuffles. Deterministic top-k: numwait
    DESC with s_name tie-break.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    fl = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")).alias(
            "late"
        ),
    )
    l1 = fl.filter(F.col("late")).select(
        F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("skey")
    )
    l2 = fl.select(
        F.col("l_orderkey").alias("okey2"), F.col("l_suppkey").alias("skey2")
    )
    l3 = fl.filter(F.col("late")).select(
        F.col("l_orderkey").alias("okey3"), F.col("l_suppkey").alias("skey3")
    )
    waiting = (
        l1.join(
            l2,
            (l1.okey == l2.okey2) & (l1.skey != l2.skey2),
            "left_semi",
        ).join(
            l3,
            (l1.okey == l3.okey3) & (l1.skey != l3.skey3),
            "left_anti",
        )
    )
    return (
        waiting.join(maybe_broadcast(s, sf_dir, "supplier"), waiting.skey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
