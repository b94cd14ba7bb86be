"""Business-analytics and dedup-pipeline composites, round 3: growth
curves, engagement stickiness, regex extraction, modal statistics,
duplicate survivorship, and a multi-metric supplier scorecard.

Determinism conventions as everywhere in this package: calendar keys
are TZ-free integers (year*100+month, epoch days), every cross-engine
compare runs on exact integers, ratios are rounded identically on
both sides, and window tie-breaks are total orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.functions.money import sum_disc_price
from parking_violations_data_pipeline_spark.operators import dedup as D
from parking_violations_data_pipeline_spark.operators.graph import (
    connected_components,
)
from parking_violations_data_pipeline_spark.registry import register


@register(
    "q_monthly_growth",
    oracle="""
WITH m AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY ym
)
SELECT ym, CAST(round(cents / 100.0, 2) AS DOUBLE) AS revenue,
  round((cents - lag(cents) OVER (ORDER BY ym))
        / CAST(lag(cents) OVER (ORDER BY ym) AS DOUBLE), 6) AS mom_growth
FROM m ORDER BY ym
""",
    tags=("E2", "D1", "H2"),
)
def q_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly cents totals (exact
    integers, TZ-free year*100+month key) with a lag-1 window ratio.

    The window runs over the aggregated month grid (≤ a few hundred
    rows at any corpus scale), so the single-partition window is
    bounded — the heavy lifting is the partial+final month agg over
    the fact table. First month's growth is NULL on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    w = Window.orderBy("ym")
    prev = F.lag("cents").over(w)
    return m.select(
        "ym",
        F.round(F.col("cents") / 100.0, 2).cast("double").alias("revenue"),
        F.round((F.col("cents") - prev) / prev.cast("double"), 6).alias("mom_growth"),
    ).orderBy("ym")


@register(
    "e_user_stickiness",
    oracle="""
WITH d AS (
  SELECT year(ts) * 100 + month(ts) AS ym,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS ep_day,
         count(DISTINCT user_id) AS dau
  FROM events GROUP BY ym, ep_day
),
m AS (
  SELECT year(ts) * 100 + month(ts) AS mym, count(DISTINCT user_id) AS mau
  FROM events GROUP BY mym
)
SELECT d.ep_day, d.dau, m.mau, round(d.dau / CAST(m.mau AS DOUBLE), 6) AS stickiness
FROM d JOIN m ON m.mym = d.ym
ORDER BY d.ep_day
""",
    tags=("D2", "H2", "C3"),
)
def e_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the standard engagement ratio.

    Two exact distinct-count aggregations (day grain and month grain)
    with the tiny month table broadcast back onto the day grid.
    Calendar keys are TZ-free integers (epoch days, year*100+month).
    At scale both inputs shuffle once on their group key;
    count(DISTINCT) expands to the two-phase distinct aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    ep_day = F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    ym = F.year("ts") * 100 + F.month("ts")
    d = e.groupBy(ym.alias("ym"), ep_day.alias("ep_day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    m = e.groupBy(ym.alias("mym")).agg(F.countDistinct("user_id").alias("mau"))
    return (
        d.join(F.broadcast(m), d.ym == m.mym)
        .select(
            "ep_day",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau").cast("double"), 6).alias("stickiness"),
        )
        .orderBy("ep_day")
    )


@register(
    "h_regex_extract_all",
    oracle="""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[a-z]+a[a-z]+')) AS BIGINT) AS n_matches,
  md5(coalesce(array_to_string(regexp_extract_all(text, '[a-z]+a[a-z]+'), '|'), ''))
    AS matches_md5
FROM documents ORDER BY doc_id
""",
    tags=("H1", "B4"),
)
def h_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 widening: regexp_extract_all — pull EVERY match out of a
    string column (vs the single-match regexp_extract already covered
    by h_string_funcs). The pattern ('a' with letters on both sides)
    uses only constructs Java regex and RE2 treat identically; match
    lists are order-preserving on both engines and proven equal via
    md5 of the '|'-join, keeping the compared rows narrow. Zero-match
    documents: Spark's concat_ws gives '' while DuckDB's
    array_to_string gives NULL — the oracle COALESCEs to '' (found by
    the sf0.1 gate, where such a document first appears).
    """
    d = load_table(spark, sf_dir, "documents")
    # Spark requires an explicit capture group (idx defaults to 1);
    # the group spans the whole pattern, so DuckDB's group-0 full-match
    # semantics return the identical strings.
    matches = F.expr("regexp_extract_all(text, '([a-z]+a[a-z]+)', 1)")
    return d.select(
        "doc_id",
        F.size(matches).cast("long").alias("n_matches"),
        F.md5(F.concat_ws("|", matches)).alias("matches_md5"),
    ).orderBy("doc_id")


@register(
    "d_mode_per_group",
    oracle="""
SELECT l_returnflag, mode_qty, n_occurrences FROM (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS mode_qty,
         count(*) AS n_occurrences,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY count(*) DESC, CAST(l_quantity AS BIGINT))
           AS rn
  FROM lineitem GROUP BY l_returnflag, l_quantity
) WHERE rn = 1 ORDER BY l_returnflag
""",
    tags=("D1", "D7", "E1"),
)
def d_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (most frequent quantity per return
    flag) — the argmax-of-counts composite DuckDB spells `mode()`;
    both engines compute it here via the count + row_number pattern
    because mode()'s tie survivor is unspecified, and the explicit
    `count DESC, value ASC` order makes the tie-break a total order.
    The window runs over the (flag, quantity) aggregate — bounded by
    the value domain, not the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cnts = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("mode_qty")
    ).agg(F.count("*").alias("n_occurrences"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n_occurrences"), "mode_qty"
    )
    return (
        cnts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", "mode_qty", "n_occurrences")
        .orderBy("l_returnflag")
    )


@register(
    "t_dedup_survivorship",
    oracle="""
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
        FROM documents) WHERE len(w) >= 3
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT i.id_a, i.id_b
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) i
  JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), cc AS (
  SELECT DISTINCT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, cc.label FROM cc JOIN edges e ON e.src = cc.node
), membership AS (
  SELECT node, min(label) AS cluster_id FROM cc GROUP BY node
), ranked AS (
  SELECT m.cluster_id, m.node, d.n_chars,
         row_number() OVER (PARTITION BY m.cluster_id
                            ORDER BY d.n_chars DESC, m.node) AS rn
  FROM membership m JOIN documents d ON d.doc_id = m.node
)
SELECT cluster_id,
  max(CASE WHEN rn = 1 THEN node END) AS survivor_id,
  CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS survivor_chars,
  count(*) AS n_members,
  count(*) - 1 AS n_dropped
FROM ranked GROUP BY cluster_id ORDER BY cluster_id
""",
    tags=("J18", "J6", "G3", "E1", "C1"),
)
def t_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy on near-dup clusters: within each connected
    component of the Jaccard>=0.5 pair graph, keep the LONGEST
    document (ties -> smallest doc_id) and count the dropped members —
    the decision step between t_dup_clusters (who is duplicated) and
    the final corpus write.

    Same CC machinery as t_dup_clusters (min-label propagation,
    O(diameter) bounded shuffles); the survivor pick is one
    row_number window over cluster membership joined to document
    stats — membership is pairs-scale, never corpus-scale.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = D.shingle_sets(d, 3)
    pairs = D.exact_jaccard_pairs(sh).filter(F.col("jaccard") >= 0.5)
    labels = connected_components(pairs, src="id_a", dst="id_b")
    member = labels.groupBy("node").agg(F.min("label").alias("cluster_id"))
    ranked = member.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "node")
        ),
    )
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("node"))).alias("survivor_id"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
            .cast("long")
            .alias("survivor_chars"),
            F.count("*").alias("n_members"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .orderBy("cluster_id")
    )


@register(
    "e_percent_rank_cume",
    oracle="""
SELECT o_custkey, o_orderkey,
  round(percent_rank() OVER w, 6) AS pr,
  round(cume_dist() OVER w, 6) AS cd
FROM orders
WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    tags=("E1",),
)
def e_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 widening: percent_rank and cume_dist — the relative-position
    window pair not covered by e_rank_variants. The window orders by
    exact integer cents with the orderkey tie-break (a total order),
    so both engines see identical rank positions; the two ratios are
    rounded at 6 decimals.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.round(F.col("o_totalprice") * 100).cast("long"), "o_orderkey"
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "t_dedup_end_to_end",
    oracle="""
WITH RECURSIVE sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(range(1, len(w)-1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
        FROM documents) WHERE len(w) >= 3
), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT i.id_a, i.id_b
  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) i
  JOIN sizes sa ON sa.doc_id = i.id_a JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), cc AS (
  SELECT DISTINCT src AS node, src AS label FROM edges
  UNION
  SELECT e.dst AS node, cc.label FROM cc JOIN edges e ON e.src = cc.node
), membership AS (
  SELECT node, min(label) AS cluster_id FROM cc GROUP BY node
), ranked AS (
  SELECT m.cluster_id, m.node,
         row_number() OVER (PARTITION BY m.cluster_id
                            ORDER BY d.n_chars DESC, m.node) AS rn
  FROM membership m JOIN documents d ON d.doc_id = m.node
), removed AS (SELECT node FROM ranked WHERE rn > 1)
SELECT (SELECT count(*) FROM documents) AS n_docs_before,
  (SELECT count(*) FROM documents) - (SELECT count(*) FROM removed) AS n_docs_after,
  CAST((SELECT count(*) FROM removed) AS BIGINT) AS n_removed,
  CAST((SELECT count(*) FROM membership) AS BIGINT) AS n_in_clusters,
  (SELECT CAST(sum(n_chars) AS BIGINT) FROM documents
   WHERE doc_id NOT IN (SELECT node FROM removed)) AS chars_kept
""",
    tags=("J6", "G3", "C5", "D1"),
)
def t_dedup_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline as ONE op: find near-dup pairs →
    cluster (connected components) → pick survivors (keep-longest) →
    anti-join the losers out of the corpus → emit the before/after
    accounting a data curator reports.

    This registered form uses the exact-Jaccard pair finder (bounded-n
    ground truth, consistent with t_dup_clusters); the 100-TB path
    swaps in MinHash/LSH pairs — timed end-to-end in SCALE_SMOKE.md
    (op:cc_dup_clusters_lsh / op:survivorship_lsh). The final removal
    is a left-anti join of the corpus against the (tiny) loser set,
    and chars_kept proves the survivor selection, not just the counts.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = D.shingle_sets(d, 3)
    pairs = D.exact_jaccard_pairs(sh).filter(F.col("jaccard") >= 0.5)
    labels = connected_components(pairs, src="id_a", dst="id_b")
    member = labels.groupBy("node").agg(F.min("label").alias("cluster_id"))
    ranked = member.join(
        d.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "node")
        ),
    )
    removed = ranked.filter(F.col("rn") > 1).select(F.col("node").alias("doc_id"))
    kept = d.join(maybe_broadcast(removed, sf_dir, "documents"), "doc_id", "left_anti")
    stats_before = d.agg(F.count("*").alias("n_docs_before"))
    stats_member = member.agg(F.count("*").cast("long").alias("n_in_clusters"))
    stats_removed = removed.agg(F.count("*").cast("long").alias("n_removed"))
    stats_kept = kept.agg(
        F.count("*").alias("n_docs_after"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )
    return (
        stats_before.join(F.broadcast(stats_kept))
        .join(F.broadcast(stats_removed))
        .join(F.broadcast(stats_member))
        .select(
            "n_docs_before",
            "n_docs_after",
            "n_removed",
            "n_in_clusters",
            "chars_kept",
        )
    )


@register(
    "q_supplier_scorecard",
    oracle="""
WITH sc AS (
  SELECT l.l_suppkey,
    sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS units,
    count(*) AS n_lines,
    count(DISTINCT l.l_partkey) AS n_parts,
    CAST(sum(CASE WHEN l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) AS BIGINT) AS late_lines
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_suppkey
)
SELECT s.s_name,
  CAST(round(sc.units / 10000.0, 2) AS DOUBLE) AS revenue,
  sc.n_lines, sc.n_parts,
  round(sc.late_lines / CAST(sc.n_lines AS DOUBLE), 6) AS late_ratio,
  rank() OVER (ORDER BY sc.units DESC) AS revenue_rank
FROM sc JOIN supplier s ON s.s_suppkey = sc.l_suppkey
ORDER BY revenue_rank, s.s_name
""",
    tags=("D1", "D2", "E1", "C1", "B6"),
)
def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric supplier scorecard: exact-unit revenue, line and
    distinct-part counts, late-shipment ratio, and a dense revenue
    rank — the one-scan "entity 360" report shape.

    All metrics come out of ONE per-supplier aggregate over the
    orders-joined fact (orders broadcast); the rank window orders by
    the exact integer units (not the rounded double), so rank ties are
    engine-identical. The window input is suppliers-scale, not
    fact-scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    units = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    ).cast("decimal(38,0)")
    late = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    sc = (
        li.join(maybe_broadcast(o, sf_dir, "orders"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(units).alias("units"),
            F.count("*").alias("n_lines"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("late_lines"),
        )
    )
    return (
        sc.join(maybe_broadcast(s, sf_dir, "supplier"), sc.l_suppkey == s.s_suppkey)
        .select(
            "s_name",
            F.round(F.col("units") / 10000.0, 2).cast("double").alias("revenue"),
            "n_lines",
            "n_parts",
            F.round(
                F.col("late_lines") / F.col("n_lines").cast("double"), 6
            ).alias("late_ratio"),
            F.rank().over(Window.orderBy(F.desc("units"))).alias("revenue_rank"),
        )
        .orderBy("revenue_rank", "s_name")
    )
