"""Scalar function families (SURVEY.md §2 H) as oracle pairs.

All expressions are JVM-side built-ins (whole-stage codegen) — no
Python UDFs anywhere in this module. Dialect divergences handled per
SURVEY.md §5: Spark split() is regex (literal-safe delimiters only),
weekday/isodow used instead of the incompatible dayofweek numbering,
raw hash values never compared cross-engine (mapped outputs instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parking_violations_data_pipeline_spark.catalog import load_table
from parking_violations_data_pipeline_spark.catalog import maybe_broadcast
from parking_violations_data_pipeline_spark.registry import register


@register(
    "h_string_funcs",
    oracle="""
SELECT c_custkey,
  -- JVM upper() applies Unicode FULL case mapping (ß -> SS); DuckDB
  -- maps ß to the capital sharp-s ẞ. Pre-folding ß to ss makes both
  -- engines agree (upper('ss') = 'SS'); a no-op on ASCII corpora
  upper(replace(c_name, 'ß', 'ss')) AS uname,
  lower(c_mktsegment) AS lseg,
  trim(' ' || c_name || ' ') AS trimmed,
  concat_ws('|', c_name, c_mktsegment) AS joined,
  substring(c_name, 1, 8) AS prefix,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_id,
  length(c_name) AS name_len,
  instr(c_name, '0') AS first_zero,
  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
  regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devoweled
FROM customer ORDER BY c_custkey
""",
    tags=("H1",),
)
def h_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1: the reference's address/description cleaning toolkit —
    case, trim, concat, substring, zero-padding (zip codes), regex."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("uname"),
            F.lower("c_mktsegment").alias("lseg"),
            F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
            F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
            F.substring("c_name", 1, 8).alias("prefix"),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_id"),
            F.length("c_name").alias("name_len"),
            F.instr(F.col("c_name"), "0").alias("first_zero"),
            F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
            F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("devoweled"),
        )
        .orderBy("c_custkey")
    )


@register(
    "h_datetime_funcs",
    oracle="""
SELECT o_orderkey,
  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
  hour(o_orderdate) AS hr,
  isodow(o_orderdate) AS dow_iso,
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
  datediff('day', o_orderdate, TIMESTAMP '2001-12-31') AS days_to_eoy,
  -- floor, not CAST: unix time truncates toward -inf; DuckDB's
  -- BIGINT cast ROUNDS, flipping ...59.999999 to the next second
  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
  o_orderdate + INTERVAL 90 DAY AS due_date
FROM orders ORDER BY o_orderkey
""",
    tags=("H2",),
)
def h_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: timestamp parsing/arithmetic toolkit (the reference's
    issue_datetime handling). isodow (Mon=1..Sun=7) is the portable
    day-of-week — Spark dayofweek and DuckDB dayofweek number
    differently, so we standardize on ISO."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.hour("o_orderdate").alias("hr"),
            (F.weekday("o_orderdate") + 1).alias("dow_iso"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.datediff(F.lit("2001-12-31").cast("timestamp"), "o_orderdate").alias("days_to_eoy"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "h_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
  -- rates multiply FIRST and price is DECIMAL(28,4): DuckDB executes
  -- width-18 decimals in int64 and overflows at 1e7 prices; 28 forces
  -- 128-bit storage. Real scale is ≤ 6 digits (2+2+2), so the
  -- precision-loss rounding both engines apply stays exact.
  CAST(round(CAST(l_extendedprice AS DECIMAL(28,4))
             * ((1 - CAST(l_discount AS DECIMAL(8,6)))
                * (1 + CAST(l_tax AS DECIMAL(8,6)))), 2) AS DOUBLE) AS net,
  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
  CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
  abs(l_discount - 0.05) AS adist,
  -- domain-guarded: DuckDB ERRORS on sqrt(negative) / ln(<=0) where
  -- Spark yields NaN / -inf-or-NULL; NULL outside the domain is the
  -- shared SQL semantics (a refund row carries a negative price)
  CASE WHEN l_extendedprice >= 0 THEN round(sqrt(l_extendedprice), 6) END AS sq,
  CASE WHEN l_extendedprice > 0 THEN round(ln(l_extendedprice), 6) END AS lg,
  round(pow(l_quantity, 2.0), 2) AS qsq,
  CAST(l_quantity AS BIGINT) % 7 AS qmod
FROM lineitem ORDER BY l_orderkey, l_linenumber
""",
    tags=("H3",),
)
def h_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: arithmetic / rounding / libm functions on the money columns.
    All computed doubles rounded on both sides (summation-order ulps
    can't occur row-wise, but libm last-ulp differences can)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            # decimal-exact money math: double round() is ulp-unstable at
            # exact .005 halves and diverges between engines (measured).
            # (28,4) price × (rate product) keeps the chain 128-bit on
            # both engines to 1e14 prices — DECIMAL(12,6) refused at 1e7
            # and DuckDB's width-18 int64 path overflowed (extremes
            # fixture). Real scale ≤ 6 digits, so the precision-loss
            # rounding both engines apply past width 38 stays exact.
            F.round(
                F.col("l_extendedprice").cast("decimal(28,4)")
                * (
                    (F.lit(1) - F.col("l_discount").cast("decimal(8,6)"))
                    * (F.lit(1) + F.col("l_tax").cast("decimal(8,6)"))
                ),
                2,
            )
            .cast("double")
            .alias("net"),
            F.floor("l_extendedprice").alias("fl"),
            F.ceil("l_extendedprice").alias("cl"),
            F.abs(F.col("l_discount") - 0.05).alias("adist"),
            # domain-guarded to NULL (see oracle note): Spark sqrt(<0)
            # is NaN and log(<=0) is NULL; DuckDB errors — NULL is the
            # shared semantics for out-of-domain money
            F.when(
                F.col("l_extendedprice") >= 0,
                F.round(F.sqrt("l_extendedprice"), 6),
            ).alias("sq"),
            F.when(
                F.col("l_extendedprice") > 0,
                F.round(F.log("l_extendedprice"), 6),
            ).alias("lg"),
            F.round(F.pow("l_quantity", F.lit(2.0)), 2).alias("qsq"),
            (F.col("l_quantity").cast("bigint") % 7).alias("qmod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "h_hash_anonymize",
    oracle="""
WITH ids AS (
  SELECT o_custkey, row_number() OVER (ORDER BY o_custkey) AS anon_id
  FROM (SELECT DISTINCT o_custkey FROM orders)
)
SELECT i.anon_id, count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS total
FROM orders o JOIN ids i ON o.o_custkey = i.o_custkey
GROUP BY i.anon_id ORDER BY i.anon_id
""",
    tags=("H4", "E1", "C1"),
)
def h_hash_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: deterministic surrogate-key assignment — the reference's
    anonymization stage (anon_ticket_number / anon_plate_id): distinct
    natural keys → dense sequential ids → join back. The persistent
    (incremental, max_id+row_number) variant lives in plans/etl.py.

    Note raw hash values (xxhash64/sha2) are never oracle-compared —
    Spark and DuckDB hash primitives differ; we compare the *mapping*.
    """
    o = load_table(spark, sf_dir, "orders")
    ids = (
        o.select("o_custkey")
        .distinct()
        .withColumn("anon_id", F.row_number().over(W.orderBy("o_custkey")))
    )
    return (
        o.join(maybe_broadcast(ids, sf_dir, "orders"), "o_custkey")
        .groupBy("anon_id")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("anon_id")
    )


@register(
    "h_hash_digest",
    oracle="""
SELECT c_custkey, sha256(c_name) AS sha, md5(c_name) AS md5h, TRUE AS xx_ok
FROM customer ORDER BY c_custkey
""",
    tags=("H4",),
)
def h_hash_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: cryptographic digests as surrogate keys. sha256/md5 hex is
    a STANDARD (identical across engines) → compared value-for-value
    against DuckDB. xxhash64 values are engine-specific, so its
    invariant — injective on this key space, i.e. distinct hashes ==
    distinct names — is computed in-plan as xx_ok; oracle emits TRUE."""
    c = load_table(spark, sf_dir, "customer")
    # hash only NON-NULL names: xxhash64(NULL) returns the seed (a
    # real value), which would make the injectivity census count a
    # phantom hash for an all-NULL column
    xx_ok = c.agg(
        (
            F.countDistinct(
                F.when(F.col("c_name").isNotNull(), F.xxhash64("c_name"))
            )
            == F.countDistinct("c_name")
        ).alias("xx_ok")
    )
    return (
        c.select(
            "c_custkey",
            F.sha2(F.col("c_name"), 256).alias("sha"),
            F.md5(F.col("c_name")).alias("md5h"),
        )
        .crossJoin(F.broadcast(xx_ok))
        .orderBy("c_custkey")
    )


@register(
    "h_array_funcs",
    oracle="""
SELECT vec_id,
  len(embedding) AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
  round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 6) AS head_sum,
  round(CAST(list_sort(embedding)[64] AS DOUBLE), 6) AS max_val,
  len(list_filter(embedding, x -> x > 0)) AS n_pos
FROM embeddings ORDER BY vec_id
""",
    tags=("H5",),
)
def h_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: array surface — size, indexing, slice, sort, higher-order
    filter/transform/aggregate. Element arithmetic cast to double
    before accumulating so both engines sum identically."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at(emb_d, 1), 6).alias("first_val"),
            F.round(
                F.aggregate(F.slice(emb_d, 1, 8), F.lit(0.0), lambda s, x: s + x), 6
            ).alias("head_sum"),
            F.round(F.element_at(F.array_sort(emb_d), 64), 6).alias("max_val"),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        )
        .orderBy("vec_id")
    )


@register(
    "h_map_funcs",
    oracle="""
WITH j AS (
  SELECT event_id, CASE WHEN json_valid(props) THEN props END AS jp
  FROM events
),
v AS (
  -- Spark's from_json('map<string,int>') is STRICTLY typed: the whole
  -- map is NULL unless props is a flat JSON object whose every value
  -- is an int or null. Mirror that predicate exactly.
  SELECT event_id, jp,
    coalesce(json_type(jp) = 'OBJECT'
      AND coalesce(list_aggregate(list_transform(json_keys(jp),
            x -> json_type(jp, '$."' || x || '"') = 'NULL'
                 OR try_cast(json_extract_string(jp, '$."' || x || '"')
                             AS INTEGER) IS NOT NULL),
          'bool_and'), TRUE), FALSE) AS is_map
  FROM j
)
SELECT event_id,
  CASE WHEN is_map THEN try_cast(json_extract_string(jp, '$.k') AS INTEGER) END AS k,
  CASE WHEN is_map THEN len(json_keys(jp)) END AS n_keys
FROM v ORDER BY event_id
""",
    tags=("H6", "H7"),
)
def h_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: JSON→map parse then map ops (element_at / map_keys) — the
    natural Spark handling of the events.props column."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        e.select(
            "event_id",
            F.element_at(m, "k").alias("k"),
            F.size(F.map_keys(m)).alias("n_keys"),
        )
        .orderBy("event_id")
    )


@register(
    "h_json_funcs",
    oracle="""
SELECT event_id,
  CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INT) AS k,
  CAST(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k') AS VARCHAR) AS k_str,
  CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.missing') AS INT) AS missing_key,
  CASE WHEN CAST(json_extract(CASE WHEN json_valid(props) THEN props END, '$.k') AS INT) >= 50 THEN 'hi' ELSE 'lo' END AS k_band
FROM events ORDER BY event_id
""",
    tags=("H7",),
)
def h_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7: JSON path extraction (typed + string + missing-key→NULL)
    with downstream conditional logic; get_json_object runs JVM-side."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select(
            "event_id",
            k.alias("k"),
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.missing").cast("int").alias("missing_key"),
            F.when(k >= 50, "hi").otherwise("lo").alias("k_band"),
        )
        .orderBy("event_id")
    )


@register(
    "h_misc_funcs",
    oracle="""
SELECT n_nationkey,
  greatest(n_nationkey, n_regionkey * 5) AS g,
  least(n_nationkey, n_regionkey * 5) AS l,
  nullif(n_regionkey, 2) AS nr,
  CASE WHEN n_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS par,
  coalesce(array_to_string([n_name, r_name], '/'), '') AS path,
  repeat('-', CAST(n_regionkey AS INT) + 1) AS dashes,
  len(range(0, n_regionkey + 1)) AS seq_len
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_nationkey
""",
    tags=("H1", "H3", "B6"),
)
def h_misc_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H: conditional/comparison/sequence utilities — greatest, least,
    nullif, parity CASE, array_join, repeat, sequence length."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "n_nationkey",
            F.greatest(F.col("n_nationkey"), F.col("n_regionkey") * 5).alias("g"),
            F.least(F.col("n_nationkey"), F.col("n_regionkey") * 5).alias("l"),
            F.nullif(F.col("n_regionkey"), F.lit(2)).alias("nr"),
            F.when(F.col("n_nationkey") % 2 == 0, "even").otherwise("odd").alias("par"),
            F.array_join(F.array("n_name", "r_name"), "/").alias("path"),
            F.repeat(F.lit("-"), F.col("n_regionkey") + 1).alias("dashes"),
            F.size(F.sequence(F.lit(0), F.col("n_regionkey"))).alias("seq_len"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "h_fuzzy_match",
    oracle="""
WITH probes AS (
  SELECT c_custkey AS probe_key,
         substr(c_name, 1, length(c_name) - 1) || 'X' AS probe_name
  FROM customer WHERE c_custkey % 75 = 0
), scored AS (
  SELECT p.probe_key, c.c_custkey,
         levenshtein(p.probe_name, c.c_name) AS dist
  FROM probes p CROSS JOIN customer c
)
SELECT probe_key,
       min(dist) AS best_dist,
       min(c_custkey) FILTER (WHERE dist = (
         SELECT min(dist) FROM scored s2 WHERE s2.probe_key = scored.probe_key
       )) AS best_custkey,
       count(*) FILTER (WHERE dist = (
         SELECT min(dist) FROM scored s2 WHERE s2.probe_key = scored.probe_key
       )) AS n_at_best
FROM scored GROUP BY probe_key ORDER BY probe_key
""",
    tags=("H1", "C3", "B6"),
)
def h_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy master-data matching: a small dirty batch (last name char
    corrupted) matched against the customer master by Levenshtein
    distance — per probe the best distance, the lowest-key best match
    and the tie count (the corrupted digit position makes every
    sibling key equidistant, so ties are real and the tie-break is
    exercised). The dirty batch broadcasts; the master is scanned
    once — the production shape for 'match this batch of 10k dirty
    records against 100M masters' (blocking keys would cut the master
    scan further; the fixtures' uniform names defeat prefix blocking
    by construction)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    probes = c.filter(F.col("c_custkey") % 75 == 0).select(
        F.col("c_custkey").alias("probe_key"),
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"), F.lit("X")
        ).alias("probe_name"),
    )
    scored = c.crossJoin(F.broadcast(probes)).select(
        "probe_key",
        "c_custkey",
        F.levenshtein("probe_name", "c_name").alias("dist"),
    )
    w = W.partitionBy("probe_key")
    return (
        scored.withColumn("best_dist", F.min("dist").over(w))
        .filter(F.col("dist") == F.col("best_dist"))
        .groupBy("probe_key")
        .agg(
            F.min("dist").alias("best_dist"),
            F.min("c_custkey").alias("best_custkey"),
            F.count("*").alias("n_at_best"),
        )
        .orderBy("probe_key")
    )
