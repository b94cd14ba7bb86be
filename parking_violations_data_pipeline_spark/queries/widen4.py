"""Round-3 widening batch 5: distribution-drift statistics (KS, PSI,
Benford), inter-order gap medians, LATERAL correlated subqueries,
multiset EXCEPT/INTERSECT ALL, CCNet-style perplexity bucketing, and
Matryoshka embedding energy profiles.

Drift detection is a first-class need of a 100 TB training-data
pipeline: feature/label distributions shift between snapshots, and the
KS / PSI statistics here are the standard alarms. Both are expressed
as pure DataFrame aggregations — the heavy reduction happens at the
distinct-value or bin grain, so the single-partition prefix-sum at the
end sees thousands of rows, not billions.

House rules (registry.py): identical aliases both sides, BIGINT casts
around every DuckDB integer aggregate (HUGEINT trap), doubles rounded
on both sides, total-order tie-breaks on every top-k, no array-typed
output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table, register_views
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "d_ks_drift",
    oracle="""
WITH s AS (
  SELECT round(value, 2) AS v,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS early
  FROM events WHERE event_type = 'purchase'
),
per AS (
  SELECT v, CAST(sum(early) AS BIGINT) AS c1,
         CAST(sum(1 - early) AS BIGINT) AS c2
  FROM s GROUP BY v
),
cum AS (
  SELECT
    sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
    sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
    sum(c1) OVER () AS n1,
    sum(c2) OVER () AS n2
  FROM per
)
SELECT CAST(max(n1) AS BIGINT) AS n_early,
       CAST(max(n2) AS BIGINT) AS n_late,
       round(max(abs(cum1 * 1.0 / n1 - cum2 * 1.0 / n2)), 6) AS ks_stat
FROM cum
""",
    tags=("D1", "E3", "J2"),
)
def d_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic: purchase-value
    distribution of the first half of the month vs the second half.

    KS = max_x |F1(x) − F2(x)|. The scan aggregates to the DISTINCT
    VALUE grain first (one shuffle on `v`), so the ordered prefix-sum
    that builds both ECDFs runs over |distinct values| rows, not |rows|
    — at 100 TB you bin `v` to a fixed grid (the round(…, 2) here IS
    that grid) and the final window sees a bounded series regardless of
    input size. The default RANGE frame would also work; ROWS over the
    distinct grain is explicit on both engines.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = e.select(
        F.round("value", 2).alias("v"),
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("early"),
    )
    per = s.groupBy("v").agg(
        F.sum("early").alias("c1"),
        F.sum(1 - F.col("early")).alias("c2"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cum = per.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    return cum.agg(
        F.max("n1").alias("n_early"),
        F.max("n2").alias("n_late"),
        # try_divide: a sample with zero rows on one side has no ECDF
        # (NULL, like DuckDB /0), not an ANSI abort
        F.round(
            F.max(
                F.abs(
                    F.try_divide(F.col("cum1"), F.col("n1"))
                    - F.try_divide(F.col("cum2"), F.col("n2"))
                )
            ),
            6,
        ).alias("ks_stat"),
    )


@register(
    "d_psi_drift",
    oracle="""
WITH s AS (
  SELECT least(CAST(floor(value / 30) AS BIGINT), 9) AS bin,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS ref
  FROM events WHERE event_type = 'purchase'
),
per AS (
  SELECT bin, CAST(sum(ref) AS BIGINT) AS n_ref,
         CAST(sum(1 - ref) AS BIGINT) AS n_cur
  FROM s GROUP BY bin
),
tot AS (
  SELECT bin, n_ref, n_cur,
         sum(n_ref) OVER () AS t_ref, sum(n_cur) OVER () AS t_cur
  FROM per
)
SELECT bin, n_ref, n_cur,
  round(((n_cur + 1.0) / (t_cur + 10.0) - (n_ref + 1.0) / (t_ref + 10.0))
        * ln(((n_cur + 1.0) / (t_cur + 10.0)) / ((n_ref + 1.0) / (t_ref + 10.0))),
        6) AS psi_term
FROM tot ORDER BY bin
""",
    tags=("D1", "J2"),
)
def d_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the month's first half
    (reference) and second half (current) over 10 fixed-width value
    bins — the standard feature-drift alarm for model pipelines.

    Laplace smoothing ((n+1)/(N+bins)) keeps empty bins finite and
    deterministic on both engines. One shuffle to the bin grain; the
    `sum OVER ()` totals run over 10 rows. PSI > 0.25 is the usual
    "retrain" threshold; emitting per-bin terms (not just the total)
    localizes WHICH value range drifted.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    s = e.select(
        F.least(F.floor(F.col("value") / 30).cast("long"), F.lit(9).cast("long")).alias(
            "bin"
        ),
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("ref"),
    )
    per = s.groupBy("bin").agg(
        F.sum("ref").alias("n_ref"),
        F.sum(1 - F.col("ref")).alias("n_cur"),
    )
    wall = W.partitionBy()
    tot = per.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(wall).alias("t_ref"),
        F.sum("n_cur").over(wall).alias("t_cur"),
    )
    p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10.0)
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10.0)
    return tot.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    ).orderBy("bin")


@register(
    "d_benford_profile",
    oracle="""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
per AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n,
         sum(count(*)) OVER () AS total
  FROM d GROUP BY digit
)
SELECT digit, n,
  round(n * 1.0 / total, 6)          AS share,
  round(log10(1 + 1.0 / digit), 6)   AS benford_p,
  round(total * pow(n * 1.0 / total - log10(1 + 1.0 / digit), 2)
        / log10(1 + 1.0 / digit), 4) AS chi2_term
FROM per ORDER BY digit
""",
    tags=("D1", "H3"),
)
def d_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of order totals — the classic
    data-quality / fraud screen: natural multi-scale amounts follow
    P(d) = log10(1 + 1/d); synthetic or truncated feeds don't.

    The leading digit comes from the decimal STRING of the integer
    part, not floor(x / 10^floor(log10 x)) — string extraction is
    exact on both engines while log10-of-a-power-of-ten sits on a
    floating-point knife edge. One shuffle to 9 groups; the chi-square
    contribution per digit localizes the distortion.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    per = d.groupBy("digit").agg(F.count("*").alias("n"))
    per = per.select("digit", "n", F.sum("n").over(W.partitionBy()).alias("total"))
    share = F.col("n") / F.col("total")
    benford = F.log10(1 + 1.0 / F.col("digit"))
    return per.select(
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(benford, 6).alias("benford_p"),
        F.round(F.col("total") * F.pow(share - benford, 2) / benford, 4).alias(
            "chi2_term"
        ),
    ).orderBy("digit")


@register(
    "q_median_order_gap",
    oracle="""
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
           CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS DATE),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders
)
SELECT c_mktsegment,
  CAST(count(gap) AS BIGINT)            AS n_gaps,
  round(CAST(median(gap) AS DOUBLE), 1) AS med_gap,
  round(avg(gap), 2)                    AS avg_gap
FROM g JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    tags=("E2", "D5", "C1"),
)
def q_median_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median inter-order gap (days) per market segment — the
    repurchase-cadence metric behind churn models.

    One shuffle on o_custkey drives the lag window; the customer dim
    is broadcast; the segment rollup reuses nothing bigger than the
    gap column. Spark's median() and DuckDB's median() both
    interpolate (percentile_cont semantics), so even-count groups
    agree exactly. Date arithmetic happens at DATE grain on both
    sides — timestamps would drag timezone semantics into a pure
    day-count question.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag("o_orderdate").over(w).cast("date"),
        ).alias("gap"),
    )
    return (
        g.join(maybe_broadcast(c.select("c_custkey", "c_mktsegment"), sf_dir, "customer"),
               g.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("gap").alias("n_gaps"),
            F.round(F.median("gap").cast("double"), 1).alias("med_gap"),
            F.round(F.avg("gap"), 2).alias("avg_gap"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "c_lateral_join",
    oracle="""
SELECT n_name, s_name, round(s_acctbal, 2) AS acctbal
FROM nation, LATERAL (
  SELECT s_name, s_acctbal FROM supplier
  WHERE s_nationkey = n_nationkey
  ORDER BY s_acctbal DESC, s_name LIMIT 2
) t
ORDER BY n_name, acctbal DESC, s_name
""",
    tags=("C7", "E4"),
)
def c_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL:1999) on the Spark 4 SQL
    surface: top-2 suppliers by account balance per nation, written as
    a per-row dependent subquery instead of a window.

    Catalyst decorrelates the LATERAL + ORDER BY + LIMIT into a
    partitioned rank under the hood (DomainJoin rewrite), so the
    executed plan is the same shuffle-once window as q_window_rank —
    proving the query-language feature maps onto the scalable plan
    rather than a nested loop. Full-key ORDER BY keeps the driver
    hash stable.
    """
    register_views(spark, sf_dir)
    return spark.sql("""
SELECT n_name, s_name, round(s_acctbal, 2) AS acctbal
FROM nation, LATERAL (
  SELECT s_name, s_acctbal FROM supplier
  WHERE s_nationkey = n_nationkey
  ORDER BY s_acctbal DESC, s_name LIMIT 2
) t
ORDER BY n_name, acctbal DESC, s_name
""")


@register(
    "g_except_all",
    oracle="""
WITH a AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0),
     b AS (SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0),
     ex AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b),
     ins AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM ex)                  AS n_except,
  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM ex) AS d_except,
  (SELECT CAST(sum(o_custkey) AS BIGINT) FROM ex)            AS sum_except,
  (SELECT CAST(count(*) AS BIGINT) FROM ins)                 AS n_intersect,
  (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM ins) AS d_intersect,
  (SELECT CAST(sum(o_custkey) AS BIGINT) FROM ins)           AS sum_intersect
""",
    tags=("G2",),
)
def g_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL / INTERSECT ALL — bag semantics where the
    DISTINCT variants (g_except, g_intersect) would collapse
    duplicates: count_a(x) − count_b(x) clamped at 0, and
    min(count_a, count_b) respectively.

    Spark plans both as a single aggregate computing per-key
    occurrence counts then re-generating rows — one shuffle on the
    key, no join. The output is collapsed to multiset invariants
    (cardinality, support, key-sum) so the driver hashes six numbers,
    not a 30k-row bag.
    """
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    b = o.filter(F.col("o_orderkey") % 3 == 0).select("o_custkey")
    ex = a.exceptAll(b).agg(
        F.count("*").alias("n_except"),
        F.countDistinct("o_custkey").alias("d_except"),
        F.sum("o_custkey").alias("sum_except"),
    )
    ins = a.intersectAll(b).agg(
        F.count("*").alias("n_intersect"),
        F.countDistinct("o_custkey").alias("d_intersect"),
        F.sum("o_custkey").alias("sum_intersect"),
    )
    return ex.crossJoin(ins)


@register(
    "t_perplexity_buckets",
    oracle="""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
vocab AS (SELECT lang, w, count(*) AS cnt FROM tok GROUP BY lang, w),
lang_total AS (SELECT lang, sum(cnt) AS n FROM vocab GROUP BY lang),
doc_lp AS (
  SELECT t.doc_id, t.lang,
         round((sum(ln(v.cnt)) - count(*) * ln(max(lt.n))) / count(*), 4) AS lp
  FROM tok t
  JOIN vocab v ON v.lang = t.lang AND v.w = t.w
  JOIN lang_total lt ON lt.lang = t.lang
  GROUP BY t.doc_id, t.lang
),
bucketed AS (
  SELECT lang, lp,
         ntile(3) OVER (PARTITION BY lang ORDER BY lp DESC, doc_id) AS bucket
  FROM doc_lp
)
SELECT lang, bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(avg(lp), 4)        AS avg_lp
FROM bucketed GROUP BY lang, bucket ORDER BY lang, bucket
""",
    tags=("J2", "J3", "E1"),
)
def t_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019): score
    each document with a per-language unigram LM, then split every
    language into head / middle / tail terciles by model score —
    the standard pre-filter that keeps the fluent third of a web
    crawl and demotes the rest.

    The LM "training" is one (lang, token) aggregation; scoring joins
    tokens back to that vocab — both shuffles are at token grain and
    combine map-side. ntile runs per language over doc-grain rows.
    Scores are rounded to 4 decimals BEFORE the ntile ordering so the
    bucket boundary cannot flap on ln() ulps between engines; doc_id
    breaks remaining ties totally.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != F.lit(""))
        ).alias("w"),
    )
    vocab = tok.groupBy("lang", "w").agg(F.count("*").alias("cnt"))
    lang_total = vocab.groupBy("lang").agg(F.sum("cnt").alias("n"))
    doc_lp = (
        tok.join(vocab, ["lang", "w"])
        .join(F.broadcast(lang_total), "lang")
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                (F.sum(F.log("cnt")) - F.count("*") * F.log(F.max("n")))
                / F.count("*"),
                4,
            ).alias("lp")
        )
    )
    bucketed = doc_lp.select(
        "lang",
        "lp",
        F.ntile(3)
        .over(W.partitionBy("lang").orderBy(F.desc("lp"), "doc_id"))
        .alias("bucket"),
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("lp"), 4).alias("avg_lp"),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "j_matryoshka_energy",
    oracle="""
WITH per AS (
  SELECT k,
    round(
      list_sum(list_transform(embedding[1:k], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
      / list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      6) AS ratio
  FROM embeddings, (SELECT unnest([8, 16, 32, 64]) AS k)
)
SELECT k, CAST(count(*) AS BIGINT) AS n_vecs,
       round(avg(ratio), 4) AS avg_energy
FROM per GROUP BY k ORDER BY k
""",
    tags=("J7", "H5"),
)
def j_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation profile (Kusupati et al. 2022): what
    fraction of each embedding's L2 energy survives truncation to the
    first 8/16/32/64 dimensions — the metric that decides how far an
    MRL-trained index can shrink its vectors before recall collapses.

    Pure higher-order functions (slice + aggregate fold), JVM-side,
    no UDF: per-row cost is O(dim), the only shuffle is the 4-group
    rollup. Elements are cast to DOUBLE before squaring on BOTH
    engines (the arrays are float32; float-precision squares would
    diverge), and both fold left-to-right, so per-row ratios agree to
    the 6 rounded decimals.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    per = emb.select(
        F.explode(F.array(*[F.lit(k) for k in (8, 16, 32, 64)])).alias("k"),
        F.col("embedding"),
    ).select(
        "k",
        # zero-energy vector → ratio undefined → NULL (DuckDB /0),
        # not an ANSI abort; avg() then skips it on both engines
        F.round(
            F.try_divide(
                sq_sum(F.slice("embedding", 1, F.col("k"))),
                sq_sum(F.col("embedding")),
            ),
            6,
        ).alias("ratio"),
    )
    return (
        per.groupBy("k")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("ratio"), 4).alias("avg_energy"),
        )
        .orderBy("k")
    )
