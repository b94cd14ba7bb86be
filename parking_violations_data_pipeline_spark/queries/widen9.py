"""Round-3 widening batch 10: modern engine-surface features — runtime
bloom-filter join pruning (registered as the hinted shuffle join the
filter attaches to), Spark 4 VARIANT semi-structured access, string
collations (UTF8_LCASE) for case-insensitive semantics, and explicit
null-ordering control in sorts.

House rules (registry.py): identical aliases both sides, BIGINT casts
around DuckDB integer aggregates, doubles rounded on both sides,
total-order tie-breaks, no array-typed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.registry import register


@register(
    "c_bloom_pruned_join",
    oracle="""
SELECT o.o_orderpriority,
  CAST(count(*) AS BIGINT)                                   AS n_lines,
  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                                                             AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F' AND o.o_totalprice > 250000
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
    tags=("C1", "C9"),
)
def c_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-bloom-filter join shape: a big fact (lineitem)
    shuffle-joined to a selectively-filtered build side (orders with a
    non-key predicate). With `spark.sql.optimizer.runtime.bloomFilter`
    thresholds met, Catalyst injects `might_contain(bloom)` on the
    fact's scan so rows that cannot join are dropped BEFORE the
    shuffle — at 100 TB that converts a full-fact shuffle into a
    selectivity-proportional one.

    Deliberately hint-free: a join hint wraps the creation side in a
    ResolvedHint node that defeats InjectRuntimeFilter's
    filter-over-scan pattern match (measured — `might_contain` never
    appears with MERGE hinted on either side). So at this SF AQE
    broadcasts the filtered dim (also correct, also pinned), and
    tests/test_plans_widen9.py proves the 100 TB regime — broadcast
    off, application threshold cleared — yields SortMergeJoin plus the
    `might_contain` injection on this exact query.

    Semantics are a plain filtered equi-join rollup, so the oracle is
    straight SQL — the bloom filter is a pure pruning optimization
    with no result effect.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 250000)
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(cents).alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "h_variant_funcs",
    oracle="""
WITH parsed AS (
  SELECT event_type,
         CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT)          AS n,
  CAST(count(k) AS BIGINT)          AS n_with_k,
  CAST(min(k) AS BIGINT)            AS min_k,
  CAST(max(k) AS BIGINT)            AS max_k,
  CAST(sum(k) AS BIGINT)            AS sum_k
FROM parsed GROUP BY event_type ORDER BY event_type
""",
    tags=("H7",),
)
def h_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT: `parse_json` shreds the props JSON string into
    the binary VARIANT encoding once at ingest, and `variant_get`
    navigates it with a typed path — the open-schema column type that
    replaces string-JSON re-parsing per access. At scale the win is
    parse-once: every downstream `variant_get` reads the shredded
    binary instead of re-tokenizing text (and unlike get_json_object,
    the extraction is typed at the expression level).

    `try_parse_json` guards malformed rows (none in the fixture, but
    the call path is the production one). The VARIANT column itself
    never reaches the output — the driver comparator can't hash it —
    only typed extractions do.
    """
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "h_collation_compare",
    oracle="""
SELECT
  CAST(count(*) FILTER (WHERE lower(c_mktsegment) = 'building') AS BIGINT)
    AS n_eq_ci,
  CAST(count(*) FILTER (WHERE c_mktsegment = 'building') AS BIGINT)
    AS n_eq_cs,
  CAST(count(*) FILTER (WHERE c_name ILIKE '%customer%') AS BIGINT)
    AS n_ilike,
  CAST(count(*) FILTER (WHERE lower(c_mktsegment) IN ('building', 'machinery'))
    AS BIGINT)                                            AS n_in_ci,
  CAST(count(DISTINCT lower(c_mktsegment)) AS BIGINT)     AS n_segments_ci
FROM customer
""",
    tags=("H1", "B4"),
)
def h_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: `collate(col, 'UTF8_LCASE')` makes
    equality, IN, and DISTINCT case-insensitive at the COMPARISON
    level — no lower() rewrite of the data, so the original bytes
    survive and (at scale) the optimizer can still use zone
    maps/statistics on the raw column. `ilike` is the pattern-match
    twin. The oracle lowers explicitly — same semantics, pre-collation
    dialect.

    The fixture's segments are uppercase ('BUILDING'), so `n_eq_ci` vs
    `n_eq_cs` (lowercase literal, 0 matches) proves the collation is
    actually doing the comparison, not the data.
    """
    c = load_table(spark, sf_dir, "customer")
    seg_ci = F.collate(F.col("c_mktsegment"), "UTF8_LCASE")
    return c.agg(
        F.count_if(seg_ci == F.lit("building")).alias("n_eq_ci"),
        F.count_if(F.col("c_mktsegment") == "building").alias("n_eq_cs"),
        F.count_if(F.col("c_name").ilike("%customer%")).alias("n_ilike"),
        F.count_if(seg_ci.isin("building", "machinery")).alias("n_in_ci"),
        F.countDistinct(seg_ci).alias("n_segments_ci"),
    )


@register(
    "f_null_ordering",
    oracle="""
WITH t AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal
  FROM customer
),
nf AS (
  SELECT c_custkey, bal,
         row_number() OVER (ORDER BY bal ASC NULLS FIRST, c_custkey) AS rn
  FROM t
),
nl AS (
  SELECT c_custkey, bal,
         row_number() OVER (ORDER BY bal DESC NULLS LAST, c_custkey) AS rn
  FROM t
)
SELECT 'nulls_first_head' AS probe, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(sum(c_custkey) AS BIGINT) AS key_sum
FROM nf WHERE rn <= 50
UNION ALL
SELECT 'nulls_last_head' AS probe, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(min(c_custkey) AS BIGINT) AS min_key,
       CAST(sum(c_custkey) AS BIGINT) AS key_sum
FROM nl WHERE rn <= 50
ORDER BY probe
""",
    tags=("F1", "B5"),
)
def f_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null placement in sorts: `asc_nulls_first` /
    `desc_nulls_last` — the knob that differs across engines (Spark
    defaults nulls-first-on-asc, many SQL engines nulls-last), so any
    pipeline porting ORDER BY logic must pin it explicitly. Nulls are
    injected (negative balances → NULL) since the fixture has none.

    Each probe takes the head-50 of one ordering and emits aggregate
    evidence (null count, key checksum) rather than 50 raw rows —
    deterministic via the c_custkey tie-break.
    """
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal"),
    )

    def head_probe(order_cols, probe: str) -> DataFrame:
        w = W.orderBy(*order_cols)
        return (
            t.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 50)
            .agg(
                F.lit(probe).alias("probe"),
                F.count("*").alias("n"),
                F.sum(F.when(F.col("bal").isNull(), 1).otherwise(0)).alias(
                    "n_null"
                ),
                F.min("c_custkey").alias("min_key"),
                F.sum("c_custkey").alias("key_sum"),
            )
            .select("probe", "n", "n_null", "min_key", "key_sum")
        )

    nf = head_probe(
        [F.col("bal").asc_nulls_first(), F.col("c_custkey").asc()],
        "nulls_first_head",
    )
    nl = head_probe(
        [F.col("bal").desc_nulls_last(), F.col("c_custkey").asc()],
        "nulls_last_head",
    )
    return nf.unionAll(nl).orderBy("probe")
